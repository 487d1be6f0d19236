"""lecturemath_tpu — TPU-native rebuild of the AccessMath / FCN-LectureNet
lecture-video summarization framework (kdavila/lecturemath, IEEE ACCESS 2021).

The framework binarizes whiteboard/chalkboard lecture videos with a 3-branch
fully-convolutional U-Net, tracks handwritten connected components over time,
groups them into spatio-temporal units, segments the video temporally, and
renders one keyframe per segment as an extractive summary.

Design stance (vs the reference at /root/reference/ACCESS2021_release):
  * a lecture is a ``uint8[T, H, W, C]`` array sharded on the frame axis
  * every compute stage is a jitted transform from arrays to arrays
    (bf16 convs on the MXU, fused elementwise ops, Pallas where XLA
    cannot fuse), instead of per-frame Python loops + ctypes C kernels
  * multi-chip scaling uses ``jax.sharding.Mesh`` + collectives over ICI
  * stage artifacts are arrays + JSON/XML metadata (with a pickle
    compatibility layer for the reference's ``tempo_*.dat`` relay files)

Layering (bottom-up): core -> data -> ops -> models -> parallel ->
pipeline/train/eval -> cli.
"""

__version__ = "0.1.0"
