"""Benchmark: frames/sec/chip for the binarize -> CC -> summary pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: a synthetic 960x540 lecture (no released weights or videos ship
with the reference, so both sides run the production-width model with random
weights on procedurally generated frames — identical compute shape to the
real workload).

Ours: batched bf16 FCN forward on the TPU + host CC tracking/grouping/
segmentation/keyframes (the full stage 01-05 compute, artifacts in memory).

Baseline: the reference's own per-frame torch pipeline (FCN_LectureNet
.binarize batch-1 on CPU, reference FCN_lecturenet.py:430-505), measured
once and cached in BASELINE_MEASURED.json. Only the stage-01 forward is
timed for the reference (its stages 02-05 only add more time, so the
reported speedup is a lower bound).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# persistent XLA compile cache: the production-model compile dominates cold
# bench runs (minutes through the remote-compile tunnel)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402  (after cache env)

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

BASELINE_FILE = os.path.join(REPO, "BASELINE_MEASURED.json")

FRAMES = 48
WIDTH, HEIGHT = 960, 540


def measure_ours():
    import jax
    import numpy as np

    from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig,
                                                       FCNLectureNet,
                                                       init_variables)
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.pipeline.cc_tracking import CCTracker
    from lecturemath_tpu.pipeline import segmentation as seg
    from lecturemath_tpu.pipeline.keyframes import extract_keyframes
    from lecturemath_tpu.pipeline.video import ArraySource, compress_png
    from lecturemath_tpu.data.space_time import SpaceTimeStruct
    from lecturemath_tpu.utils.synthetic import synthetic_rgb_lecture

    config = FCNConfig()  # production widths 48..768
    import jax.numpy as jnp

    model = FCNLectureNet(config, dtype=jnp.bfloat16)
    variables = init_variables(model, jax.random.PRNGKey(0), (1, 64, 64, 3))

    rgb, clean_binary, glyphs, erase_times = synthetic_rgb_lecture(
        seed=0, n_frames=FRAMES, height=HEIGHT, width=WIDTH, n_boards=2,
        glyphs_per_board=8, glyph_size=(40, 60))

    import jax.numpy as jnp

    binarizer = Binarizer(model, variables, batch_size=8)

    # warmup: compile the packed streaming forward once (the only device
    # computation the pipeline uses)
    jax.block_until_ready(
        binarizer._packed_fn(jnp.asarray(rgb[:binarizer.batch_size])))

    start = time.perf_counter()

    source = ArraySource(rgb, fps=1.0)
    times, indices, binaries = binarizer.process_source(source)
    compressed = compress_png(binaries)  # stage-01 artifact cost

    # stages 02-05 run on the known-clean synthetic binaries so CC counts
    # reflect the real workload (random weights binarize to noise)
    tracker = CCTracker(WIDTH, HEIGHT, 0.925, 0.925, 85)
    for frame in clean_binary:
        tracker.add_frame(frame)
    tracker.split_stable_by_gaps(85, 3)
    stable = tracker.stable_cc_idxs(3)
    time_ov, _, all_ov = tracker.compute_overlapping_stable(stable, 5)
    groups, group_of = tracker.compute_groups(stable, time_ov, 0.5)
    ages, per_frame = tracker.compute_group_ages(groups)
    conflicts = tracker.compute_conflicts(stable, all_ov, len(groups), group_of)
    images, bounds = tracker.compute_group_images(groups, ages, 0.5)

    intervals = seg.segments_from_deletion_events(
        ages, bounds, FRAMES, float(WIDTH * HEIGHT), 0.00005, 3, 0.0008)

    st3d = SpaceTimeStruct(times, indices, HEIGHT, WIDTH, ages, images, bounds)
    keyframes, _ = extract_keyframes(st3d, intervals)

    elapsed = time.perf_counter() - start
    assert len(binaries) == FRAMES and len(keyframes) >= 1
    return FRAMES / elapsed


def measure_reference_baseline(max_frames=2):
    """Per-frame seconds of the reference stage-01 path (torch, CPU,
    batch 1), run from /root/reference via the oracle setup."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle import ensure_oracle
    ensure_oracle()

    import numpy as np
    from PIL import Image

    _stub_torchvision()  # image lacks torchvision; reference imports it

    from AM_CommonTools.configuration.configuration import Configuration
    from AccessMath.lecturenet_v1.FCN_lecturenet import FCN_LectureNet

    config = Configuration.from_file(
        "/root/reference/ACCESS2021_release/configs/FCN_LectureNet.conf")
    net = FCN_LectureNet.CreateFromConfig(config, 3, False)
    net.eval()

    sys.path.insert(0, REPO)
    from lecturemath_tpu.utils.synthetic import synthetic_rgb_lecture

    rgb, _, _, _ = synthetic_rgb_lecture(seed=0, n_frames=max_frames + 1,
                                         height=HEIGHT, width=WIDTH,
                                         n_boards=1, glyphs_per_board=8,
                                         glyph_size=(40, 60))
    # warmup frame (allocators, thread pools)
    net.binarize(Image.fromarray(rgb[0]), force_binary=True)

    start = time.perf_counter()
    for t in range(1, max_frames + 1):
        net.binarize(Image.fromarray(rgb[t]), force_binary=True)
    per_frame = (time.perf_counter() - start) / max_frames
    return 1.0 / per_frame  # fps


def _stub_torchvision():
    """Minimal torchvision.transforms.functional stand-in (to_tensor /
    normalize are all the reference model file touches at inference)."""
    import types

    import numpy as np
    import torch

    if "torchvision" in sys.modules:
        return

    functional = types.ModuleType("torchvision.transforms.functional")

    def to_tensor(pil_image):
        arr = np.asarray(pil_image, dtype=np.float32) / 255.0
        return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    def normalize(tensor, mean, std):
        mean_t = torch.tensor(mean).view(-1, 1, 1)
        std_t = torch.tensor(std).view(-1, 1, 1)
        return (tensor - mean_t) / std_t

    functional.to_tensor = to_tensor
    functional.normalize = normalize

    transforms = types.ModuleType("torchvision.transforms")
    transforms.functional = functional
    torchvision = types.ModuleType("torchvision")
    torchvision.transforms = transforms

    sys.modules["torchvision"] = torchvision
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def get_baseline_fps():
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["reference_fps"]
    fps = measure_reference_baseline()
    with open(BASELINE_FILE, "w") as f:
        json.dump({"reference_fps": fps,
                   "workload": f"{WIDTH}x{HEIGHT} synthetic, stage-01 "
                               f"torch CPU batch-1 (lower bound for full "
                               f"reference pipeline time)"}, f, indent=1)
    return fps


def main():
    baseline_fps = get_baseline_fps()
    ours_fps = measure_ours()
    print(json.dumps({
        "metric": "frames/sec/chip (binarize->CC->summary, 960x540)",
        "value": round(ours_fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(ours_fps / baseline_fps, 1),
    }))


if __name__ == "__main__":
    main()
