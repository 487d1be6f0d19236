"""Background batch prefetching (train/prefetch.py): stream identity,
error propagation, shutdown, and train_epoch equivalence with the
synchronous path (the reference's num_workers=0 loading,
lecturenet_train_00:92-93)."""

import time

import jax
import numpy as np
import pytest

from lecturemath_tpu.train.prefetch import PrefetchIterator, prefetch


def test_prefetch_stream_identity():
    source = list(range(37))
    assert list(prefetch(iter(source), depth=3)) == source


def test_prefetch_transform_applied_in_order():
    out = list(prefetch(iter(range(10)), depth=2,
                        transform=lambda x: x * x))
    assert out == [x * x for x in range(10)]


def test_prefetch_depth_zero_passthrough():
    gen = (x for x in range(5))
    assert prefetch(gen, depth=0) is gen
    assert list(prefetch((x for x in range(5)), depth=0,
                         transform=lambda x: -x)) == [0, -1, -2, -3, -4]


def test_prefetch_invalid_depth():
    with pytest.raises(ValueError):
        prefetch(iter(()), depth=-1)


def test_prefetch_error_propagates():
    def broken():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    it = prefetch(broken(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_prefetch_transform_error_propagates():
    def bad_transform(x):
        if x == 3:
            raise ValueError("bad batch")
        return x

    it = prefetch(iter(range(10)), depth=2, transform=bad_transform)
    got = []
    with pytest.raises(ValueError, match="bad batch"):
        for item in it:
            got.append(item)
    assert got == [0, 1, 2]


def test_prefetch_close_midstream_releases_producer():
    """Abandoning a stream with close() must unblock a producer stuck on
    the full queue (bounded backpressure) and join its thread."""
    it = PrefetchIterator(iter(range(1000)), depth=1)
    assert next(it) == 0
    it.close()
    assert not it._thread.is_alive()


def test_prefetch_context_manager():
    with PrefetchIterator(iter(range(100)), depth=2) as it:
        assert next(it) == 0
    assert not it._thread.is_alive()


def test_prefetch_backpressure_bound():
    """The producer never runs more than depth items ahead."""
    produced = []

    def source():
        for k in range(50):
            produced.append(k)
            yield k

    it = PrefetchIterator(source(), depth=2)
    try:
        assert next(it) == 0
        time.sleep(0.3)  # give the producer time to overrun if it could
        # consumed 1; at most depth(queue) + 1(in-flight put) + 1 ahead
        assert len(produced) <= 1 + 2 + 2
    finally:
        it.close()


def test_train_epoch_prefetch_matches_sync(tmp_path):
    """Prefetched training must be trajectory-identical to synchronous
    loading: same batch stream, same losses, same updated params."""
    import cv2

    from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig,
                                                       FCNLectureNet)
    from lecturemath_tpu.train.dataset import LectureNetDataset
    from lecturemath_tpu.train.trainer import Trainer

    tiny = FCNConfig(down_filters=(2, 3, 4, 5, 6), mid_filters=6,
                     upsample_filters=(2, 3, 4, 5, 6),
                     up_filters=(2, 3, 4, 5, 6), pixel_features=(4, 3),
                     kernel_size=3, pixel_kernel_size=3)
    rng = np.random.default_rng(0)
    images, gts = [], []
    for k in range(6):
        img = rng.integers(0, 255, (96, 128, 3), np.uint8)
        gt = (rng.random((96, 128)) < 0.2).astype(np.uint8) * 255
        img_path = str(tmp_path / f"img_{k}.png")
        gt_path = str(tmp_path / f"gt_{k}.png")
        cv2.imwrite(img_path, img)
        cv2.imwrite(gt_path, gt)
        images.append(img_path)
        gts.append(gt_path)

    def run(depth):
        dataset = LectureNetDataset(images, gts, crop_size=(32, 32),
                                    flip_chance=0.5, seed=11)
        model = FCNLectureNet(tiny)
        trainer = Trainer(model, learning_rate=0.05, phase="binarizer",
                          prefetch_depth=depth)
        state = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
        state, metrics = trainer.train_epoch(state, dataset, 2)
        return jax.device_get(state.params), metrics

    params_sync, metrics_sync = run(0)
    params_pre, metrics_pre = run(2)
    assert metrics_sync and metrics_sync == metrics_pre
    jax.tree.map(np.testing.assert_array_equal, params_sync, params_pre)
