"""Shared workload definition for the multi-process mesh test: the SAME
functions run in the 2-process workers (tests/mp_worker.py) and in the
single-process reference (tests/test_multiprocess_mesh.py), so any
loss/output difference is attributable to the process boundary alone."""

import numpy as np

from lecturemath_tpu.models.fcn_lecturenet import FCNConfig

NET_CONFIG = FCNConfig(
    in_channels=3, down_filters=(4, 6, 8, 12, 16), mid_filters=16,
    upsample_filters=(4, 6, 8, 12, 16), up_filters=(4, 4, 6, 8, 12),
    pixel_features=(6, 4), kernel_size=3, pixel_kernel_size=3)

TRAIN_STEPS = 3


def make_train_batch(batch: int = 8, size: int = 32):
    rng = np.random.default_rng(7)
    return {
        "image": rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32),
        "target": (rng.random((batch, size, size, 1)) > 0.6).astype(np.float32),
        "text_mask": (rng.random((batch, size, size, 1)) > 0.5).astype(np.float32),
    }


def make_frames(n: int = 8):
    from lecturemath_tpu.utils.synthetic import synthetic_rgb_lecture

    rgb, _, _, _ = synthetic_rgb_lecture(seed=5, n_frames=n, height=64,
                                         width=96, glyphs_per_board=6,
                                         glyph_size=(12, 14))
    return rgb


def run_training(mesh, batch):
    """TRAIN_STEPS dp x tp SGD steps; returns the per-step total losses.
    ``batch`` is the GLOBAL batch — identical on every host; multi-process
    runs slice each host's row share inside Trainer.shard_batch."""
    import jax
    import jax.numpy as jnp

    from lecturemath_tpu.models.fcn_lecturenet import FCNLectureNet
    from lecturemath_tpu.train.trainer import Trainer

    model = FCNLectureNet(NET_CONFIG, dtype=jnp.float32)
    trainer = Trainer(model, learning_rate=0.1, phase="binarizer", mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    losses = []
    for _ in range(TRAIN_STEPS):
        state, metrics = trainer.step(state, batch)
        losses.append(float(jax.device_get(metrics["total"])))
    return losses


def run_inference(mesh, frames):
    """Frame-sharded binarization over the mesh with the deterministic
    threshold-head checkpoint. ``frames`` is the GLOBAL batch (same on
    every host); every host receives the FULL binary output (the Binarizer
    all-gathers the packed result so host-side stages stay identical)."""
    import jax.numpy as jnp

    from lecturemath_tpu.models.fcn_lecturenet import FCNLectureNet
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.utils.synthetic import threshold_binarizer_variables

    model = FCNLectureNet(NET_CONFIG, dtype=jnp.float32)
    variables = threshold_binarizer_variables(NET_CONFIG)
    binarizer = Binarizer(model, variables, batch_size=len(frames),
                          mesh=mesh, upload_format="rgb")
    return binarizer.binarize_frames(frames)
