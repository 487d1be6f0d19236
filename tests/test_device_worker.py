"""WorkerBinarizer: the recycled device-worker child must be bit-identical
to the in-process Binarizer at any recycle granularity, and the express
pipeline must produce the same summary through it.

The worker exists to contain the axon tunnel's per-upload native-memory
retention (see pipeline/device_worker.py module docstring for the probe
evidence); on the CPU test backend it exercises the full protocol —
spawn, chunked feeding, mid-stream recycling, EOS draining, close."""

import numpy as np

from cli_workspace import build_cli_workspace
from lecturemath_tpu.core.config import Config
from lecturemath_tpu.pipeline.binarize import Binarizer
from lecturemath_tpu.pipeline.device_worker import WorkerBinarizer
from lecturemath_tpu.pipeline.video import VideoFrameSource


def _source(root):
    return VideoFrameSource([str(root / "videos" / "synth01.avi")],
                            sampling_fps=1.0)


def test_worker_matches_inprocess_with_recycling(tmp_path):
    root = build_cli_workspace(tmp_path, "devworker", n_frames=24)
    config = Config.from_file(str(root / "test.conf"))

    ref = Binarizer.from_config(config)
    ref_times, ref_indices, ref_frames = ref.process_source(_source(root))

    # 1 MB budget: any real child RSS exceeds it, so every drained-batch
    # report triggers a recycle at the next chunk boundary — the maximum
    # possible recycle churn. batch_size=4 makes batches drain mid-stream.
    worker = WorkerBinarizer(config, recycle_mb=1.0, chunk_frames=4,
                             binarizer_kwargs={"batch_size": 4})
    try:
        times, indices, frames = worker.process_source(_source(root))
    finally:
        worker.close()

    assert worker.recycles >= 1
    assert times == ref_times
    assert indices == ref_indices
    assert len(frames) == len(ref_frames)
    for got, want in zip(frames, ref_frames):
        np.testing.assert_array_equal(got, want)


def test_worker_no_recycle_and_reuse(tmp_path):
    """recycle_mb=0 keeps one child for multiple streams (the multi-lecture
    CLI pattern) with identical results each time."""
    root = build_cli_workspace(tmp_path, "devworker0", n_frames=6)
    config = Config.from_file(str(root / "test.conf"))

    ref = Binarizer.from_config(config)
    _, _, ref_frames = ref.process_source(_source(root))

    worker = WorkerBinarizer(config, chunk_frames=3)
    try:
        _, _, first = worker.process_source(_source(root))
        child = worker._child
        _, _, second = worker.process_source(_source(root))
        assert worker._child is child  # same child served both streams
    finally:
        worker.close()

    assert worker.recycles == 0
    for got, want in zip(first + second, ref_frames + ref_frames):
        np.testing.assert_array_equal(got, want)
    assert not worker._child  # closed


def test_abort_mid_stream_closes_promptly(tmp_path):
    """The express abort path: stop consuming stream_source mid-stream,
    then close(). close() must return promptly (bounded) even though the
    child still owes the stream results — a blind blocking feed put would
    deadlock against a child blocked on a full result queue."""
    import time

    root = build_cli_workspace(tmp_path, "devworker_abort", n_frames=24)
    config = Config.from_file(str(root / "test.conf"))

    worker = WorkerBinarizer(config, chunk_frames=2,
                             binarizer_kwargs={"batch_size": 2})
    gen = worker.stream_source(_source(root))
    next(gen)     # stream in flight, results pending
    gen.close()   # abandon mid-stream (what an express exception does)
    start = time.monotonic()
    worker.close()
    assert time.monotonic() - start < 45
    assert worker._child is None


def test_silently_killed_child_raises_not_hangs(tmp_path):
    """A child killed WITHOUT an error message (the OOM-SIGKILL regime the
    worker exists to contain) must surface as a RuntimeError from the
    stream — not an indefinite hang in the feed loop once the feed queue
    fills against a dead consumer."""
    import os
    import signal
    import threading

    root = build_cli_workspace(tmp_path, "devworker_kill", n_frames=24)
    config = Config.from_file(str(root / "test.conf"))

    worker = WorkerBinarizer(config, chunk_frames=2,
                             binarizer_kwargs={"batch_size": 2})
    outcome = {}

    def run():
        try:
            gen = worker.stream_source(_source(root))
            next(gen)  # child up, stream in flight
            os.kill(worker._child.pid, signal.SIGKILL)
            for _ in gen:
                pass
            outcome["result"] = "completed"
        except RuntimeError as e:
            outcome["result"] = f"raised: {e}"
        except BaseException as e:  # noqa: BLE001
            outcome["result"] = f"other: {e!r}"

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=180)
    assert not t.is_alive(), "stream hung after the child was SIGKILLed"
    assert outcome["result"].startswith("raised"), outcome
    worker.close()


def test_express_through_worker_matches(tmp_path):
    """DEVICE_WORKER_RECYCLE_MB in the config routes the express pipeline
    through the worker; the summary must equal the in-process run's."""
    from lecturemath_tpu.pipeline.driver import PipelineDriver
    from lecturemath_tpu.pipeline.express import run_lecture

    root = build_cli_workspace(tmp_path, "devworker_e2e", n_frames=10)

    def run(extra):
        conf = root / ("worker.conf" if extra else "plain.conf")
        conf.write_text((root / "test.conf").read_text() + extra)
        driver = PipelineDriver.from_config_path(str(conf), [], None, None)
        lecture = next(iter(driver.iter_lectures()))
        return run_lecture(driver, lecture, export=False)

    want = run("")
    got = run("\nDEVICE_WORKER_RECYCLE_MB = 1\n"
              "DEVICE_WORKER_CHUNK_FRAMES = 4\n")
    assert got[0] == want[0]  # summary indices
    assert got[1] == want[1]  # summary times
    assert len(got[2]) == len(want[2])
    for got_kf, want_kf in zip(got[2], want[2]):
        np.testing.assert_array_equal(got_kf, want_kf)


def test_sync_respawn_without_prespawn(tmp_path):
    """prespawn=False keeps the original synchronous respawn path —
    bit-exact at maximum recycle churn."""
    root = build_cli_workspace(tmp_path, "devworker_sync", n_frames=12)
    config = Config.from_file(str(root / "test.conf"))

    ref = Binarizer.from_config(config)
    _, _, ref_frames = ref.process_source(_source(root))

    worker = WorkerBinarizer(config, recycle_mb=1.0, chunk_frames=4,
                             prespawn=False,
                             binarizer_kwargs={"batch_size": 4})
    try:
        _, _, frames = worker.process_source(_source(root))
    finally:
        worker.close()
    assert worker.recycles >= 1
    assert worker._spare is None  # never prespawned
    for got, want in zip(frames, ref_frames):
        np.testing.assert_array_equal(got, want)


def test_warm_spare_promote_bit_exact(tmp_path):
    """The hot-spare path, deterministically: ready-wait the spare, send
    it the one-frame warmup stream, promote it, and stream through the
    promoted child — results must equal the in-process Binarizer and the
    warmup outputs must have been fully discarded."""
    root = build_cli_workspace(tmp_path, "devworker_spare", n_frames=10)
    config = Config.from_file(str(root / "test.conf"))

    ref = Binarizer.from_config(config)
    ref_times, ref_indices, ref_frames = ref.process_source(_source(root))

    worker = WorkerBinarizer(config, recycle_mb=1.0, chunk_frames=4,
                             binarizer_kwargs={"batch_size": 4})
    try:
        # spawn + warm a spare exactly as _maybe_start_spare would
        frame0 = next(_source(root).frames())[2]
        worker._warm_frame = frame0[None]
        worker._spare = worker._new_child()
        worker._spare.wait_ready()
        worker._maybe_start_spare(rss=worker.recycle_mb + 1)
        assert worker._spare.warm_sent

        # promote: the warm outputs are drained and discarded
        worker._promote_or_respawn()
        assert worker._spare is None
        promoted = worker._child
        assert promoted is not None and promoted.is_alive()

        # recycle_mb=1 means the promoted child itself recycles during
        # this stream — the hot path and the churn path compose
        times, indices, frames = worker.process_source(_source(root))
    finally:
        worker.close()

    assert times == ref_times
    assert indices == ref_indices
    for got, want in zip(frames, ref_frames):
        np.testing.assert_array_equal(got, want)


def test_compile_cache_config_plumbing(tmp_path):
    """DEVICE_WORKER_COMPILE_CACHE: unset -> shared default dir; 'none'
    -> disabled; explicit path -> passed through. Pure construction — no
    child is spawned."""
    from lecturemath_tpu.pipeline.device_worker import default_compile_cache

    root = build_cli_workspace(tmp_path, "devworker_cfg", n_frames=2)
    base = (root / "test.conf").read_text()

    def mk(extra):
        conf = root / "cache.conf"
        conf.write_text(base + extra)
        return WorkerBinarizer.from_config(Config.from_file(str(conf)))

    assert mk("").compile_cache == default_compile_cache()
    assert mk("\nDEVICE_WORKER_COMPILE_CACHE = none\n").compile_cache is None
    assert mk("\nDEVICE_WORKER_COMPILE_CACHE = /tmp/custom_cache\n"
              ).compile_cache == "/tmp/custom_cache"
    assert mk("\nDEVICE_WORKER_PRESPAWN = false\n").prespawn is False
    assert mk("").prespawn_eager is True
    assert mk("\nDEVICE_WORKER_PRESPAWN_EAGER = false\n"
              ).prespawn_eager is False
    assert WorkerBinarizer(Config.from_file(str(root / "test.conf")),
                           compile_cache="").compile_cache is None


def test_eager_standing_spare(tmp_path):
    """prespawn_eager (default): the spare exists from stream start and is
    respawned right after every promotion — it never waits for the 3/4
    budget trigger (which loses the race against slow backend-init
    windows; see the module docstring). Stream results stay bit-exact
    under maximum recycle churn."""
    root = build_cli_workspace(tmp_path, "devworker_eager", n_frames=12)
    config = Config.from_file(str(root / "test.conf"))

    ref = Binarizer.from_config(config)
    _, _, ref_frames = ref.process_source(_source(root))

    worker = WorkerBinarizer(config, recycle_mb=1.0, chunk_frames=4,
                             binarizer_kwargs={"batch_size": 4})
    try:
        assert worker.prespawn_eager is True
        gen = worker.stream_source(_source(root))
        frames = []
        first = next(gen)
        # standing spare: up from stream start, before any RSS report
        # could have crossed 3/4 budget (spare_failures would show a
        # spawn that died instead)
        assert (worker._spare is not None
                or worker.stream_stats.get("spare_failures"))
        frames.extend(first[2])
        for _, _, batch in gen:
            frames.extend(batch)
    finally:
        worker.close()

    assert worker.recycles >= 1
    for got, want in zip(frames, ref_frames):
        np.testing.assert_array_equal(got, want)

    # eager=False keeps the budget-fraction trigger: below 3/4 budget no
    # spare is started
    lazy = WorkerBinarizer(config, recycle_mb=1e9, prespawn_eager=False)
    try:
        lazy._maybe_start_spare(0.0)
        assert lazy._spare is None
        lazy._maybe_start_spare(0.9e9)
        assert lazy._spare is not None
    finally:
        lazy.close()


def test_leftover_spare_retired_at_stream_start(tmp_path):
    """A never-promoted spare from a previous stream carries that
    stream's warmup state (shapes, upload-format resolution) — a new
    stream must retire it rather than promote it later."""
    root = build_cli_workspace(tmp_path, "devworker_stale", n_frames=6)
    config = Config.from_file(str(root / "test.conf"))

    worker = WorkerBinarizer(config, chunk_frames=3)
    try:
        _, _, first = worker.process_source(_source(root))
        stale = worker._new_child()
        worker._spare = stale
        _, _, second = worker.process_source(_source(root))
    finally:
        worker.close()

    assert stale.proc is None          # closed at stream start
    assert worker._spare is None
    for got, want in zip(second, first):
        np.testing.assert_array_equal(got, want)
