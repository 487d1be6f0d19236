"""Full-state checkpoint/resume (params + optimizer + step via orbax)."""

import jax
import numpy as np

from lecturemath_tpu.models.fcn_lecturenet import FCNConfig, FCNLectureNet
from lecturemath_tpu.train.trainer import Trainer

TINY = FCNConfig(down_filters=(2, 3, 4, 5, 6), mid_filters=6,
                 upsample_filters=(2, 3, 4, 5, 6), up_filters=(2, 3, 4, 5, 6),
                 pixel_features=(4, 3), kernel_size=3, pixel_kernel_size=3)


def test_resume_round_trip(tmp_path):
    model = FCNLectureNet(TINY)
    trainer = Trainer(model, learning_rate=0.01, momentum=0.9,
                      phase="binarizer")
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))

    rng = np.random.default_rng(0)
    batch = {"image": rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32),
             "target": (rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32),
             "text_mask": (rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32)}
    state, _ = trainer.step(state, batch)
    state, _ = trainer.step(state, batch)

    ckpt_dir = str(tmp_path / "resume_ckpt")
    trainer.save_resume_checkpoint(state, ckpt_dir)

    fresh = trainer.init_state(jax.random.PRNGKey(1), (1, 32, 32, 3))
    restored = trainer.restore_resume_checkpoint(fresh, ckpt_dir)

    assert int(restored.step) == 2
    np.testing.assert_array_equal(
        np.asarray(state.params["down_1"]["conv"]["kernel"]),
        np.asarray(restored.params["down_1"]["conv"]["kernel"]))

    # optimizer momentum state restored: one more step from each must agree
    next_a, _ = trainer.step(state, batch)
    next_b, _ = trainer.step(restored, batch)
    np.testing.assert_allclose(
        np.asarray(next_a.params["mid"]["conv"]["kernel"]),
        np.asarray(next_b.params["mid"]["conv"]["kernel"]), rtol=1e-6)
