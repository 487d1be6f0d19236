"""stream_source async drain (pipeline/binarize.py _AsyncDrainer): the
background-thread fetch path must be bit-identical to the synchronous
path, must relay drain errors to the consumer, and must not leak a stuck
thread when the consumer abandons the stream mid-way."""

import threading
import time

import numpy as np
import pytest

from cli_workspace import build_cli_workspace
from lecturemath_tpu.core.config import Config
from lecturemath_tpu.pipeline.binarize import Binarizer
from lecturemath_tpu.pipeline.video import VideoFrameSource


def _source(root):
    return VideoFrameSource([str(root / "videos" / "synth01.avi")],
                            sampling_fps=1.0)


def _collect(binarizer, source):
    out = []
    for times, indices, frames in binarizer.stream_source(source):
        out.append((list(times), list(indices), [f.copy() for f in frames]))
    return out


def test_async_drain_matches_sync(tmp_path):
    root = build_cli_workspace(tmp_path, "asyncdrain", n_frames=24)
    config = Config.from_file(str(root / "test.conf"))

    sync = Binarizer.from_config(config, batch_size=4, async_drain=False)
    ref = _collect(sync, _source(root))
    assert "drain_async" not in sync.stream_stats

    live = Binarizer.from_config(config, batch_size=4, async_drain=True)
    assert live.async_drain  # single-process: stays enabled
    got = _collect(live, _source(root))
    assert live.stream_stats.get("drain_async") == 1.0

    assert len(got) == len(ref) and len(ref) >= 3  # multiple batches drained
    for (gt, gi, gf), (rt, ri, rf) in zip(got, ref):
        assert gt == rt and gi == ri
        for a, b in zip(gf, rf):
            np.testing.assert_array_equal(a, b)


def test_async_drain_is_default_and_config_gated(tmp_path):
    root = build_cli_workspace(tmp_path, "asyncdflt", n_frames=4)
    config = Config.from_file(str(root / "test.conf"))
    assert Binarizer.from_config(config).async_drain
    config.set("STREAM_ASYNC_DRAIN", 0)
    assert not Binarizer.from_config(config).async_drain


def test_async_drain_propagates_fetch_errors(tmp_path):
    root = build_cli_workspace(tmp_path, "asyncerr", n_frames=16)
    config = Config.from_file(str(root / "test.conf"))
    binarizer = Binarizer.from_config(config, batch_size=4, async_drain=True)

    calls = []
    original = binarizer._fetch

    def failing_fetch(array):
        calls.append(1)
        if len(calls) >= 2:
            raise RuntimeError("backend died mid-run")
        return original(array)

    binarizer._fetch = failing_fetch
    with pytest.raises(RuntimeError, match="backend died mid-run"):
        _collect(binarizer, _source(root))


def test_abandoned_stream_leaves_no_stuck_thread(tmp_path):
    root = build_cli_workspace(tmp_path, "asyncgone", n_frames=16)
    config = Config.from_file(str(root / "test.conf"))
    binarizer = Binarizer.from_config(config, batch_size=4, async_drain=True)

    gen = binarizer.stream_source(_source(root))
    next(gen)
    gen.close()  # GeneratorExit -> finally -> drainer.close()

    deadline = time.time() + 10.0
    while time.time() < deadline:
        if not any(t.name == "lm-stream-drain" and t.is_alive()
                   for t in threading.enumerate()):
            break
        time.sleep(0.05)
    else:
        pytest.fail("drain thread still alive 10 s after stream abandonment")

    # the binarizer remains usable for a fresh stream afterwards
    out = _collect(binarizer, _source(root))
    assert out and sum(len(f) for _, _, f in out) == 16
