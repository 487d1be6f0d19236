"""Recycling device-worker binarizer — RSS containment for long runs.

The axon remote-transfer backend on this rig PERMANENTLY retains ~1x the
uploaded bytes in native memory, per host->device transfer (measured with
minimal probes, round 5: a bare ``jax.device_put`` of a 2 MB host buffer
grows RSS ~2 MB per call; passing the numpy array straight to a jitted
function stages through the same path and leaks identically; fetching the
array back, ``del``, ``gc.collect()`` and ``malloc_trim(0)`` reclaim
nothing; retention scales with BYTES, not calls; ``jax.live_arrays()`` is
empty throughout). Nothing Python-visible holds the memory — the
retention sits inside the in-process IFRT interposer, below anything this
framework can free. At 1 FPS sampling a 1 h 1080p lecture uploads ~11 GB
of YUV frames, all of which stays resident in the dispatching process.

:class:`WorkerBinarizer` caps that: the device work runs in a CHILD
process that is recycled (cleanly exited and respawned) whenever its RSS
crosses a budget. The parent keeps the frame source (decode, sampling
accounting — pipeline/video.py semantics are untouched) and all
downstream stages; the child is stateless between batches, so recycling
at any chunk boundary is bit-exact: per-frame outputs don't depend on
batch composition (BN folded, inference mode — the same invariance the
staged/express equality tests rely on). With a persistent JAX
compilation cache (JAX_COMPILATION_CACHE_DIR) a respawn costs checkpoint
load + cached-compile re-link, seconds against the tens of minutes a
full lecture runs.

Enable on the express pipeline with ``DEVICE_WORKER_RECYCLE_MB > 0``
(single-process, meshless runs only — a multi-chip mesh keeps the device
client in-process). No reference counterpart: the reference's CUDA
process owns its GPU directly (pre_ST3D_v3.0_01_binarize.py) and has no
remote-transfer layer to leak.
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
import threading
from typing import List, Optional

import numpy as np

from ..core.config import Config
from .video import VideoFrameSource

_CHUNK_FRAMES = 16      # frames per parent->child message
_FEED_DEPTH = 4         # chunks in flight toward the child
_RESULT_DEPTH = 32      # drained batches buffered toward the parent


def _vmrss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class _QueueSource(VideoFrameSource):
    """Duck-typed frame source fed by the parent over a queue.

    Yields (time, index, frame) items from ``("chunk", times, indices,
    frames)`` messages until a ``None`` end-of-stream marker. Inherits
    ``batches``/``_pack`` so Binarizer.stream_source batching (including
    the auto-batch-size peek) behaves exactly as over a real video."""

    def __init__(self, feed_q):
        self._feed_q = feed_q

    def frames(self, frames_limit: int = 0):
        while True:
            msg = self._feed_q.get()
            if msg is None:
                return
            _, times, indices, frames = msg
            for k in range(len(times)):
                yield times[k], indices[k], frames[k]


def _pack_result(frames: List[np.ndarray]):
    stack = np.stack(frames) > 0
    return np.packbits(stack.reshape(-1)), stack.shape


def _unpack_result(bits: np.ndarray, shape) -> List[np.ndarray]:
    n = int(np.prod(shape))
    flat = np.unpackbits(bits, count=n).reshape(shape)
    return list(flat * np.uint8(255))


def _child_main(cfg_values: dict, platform: Optional[str],
                allow_random: bool, binarizer_kwargs: dict,
                feed_q, result_q) -> None:
    """Device-owning child: builds the Binarizer, then serves
    ``("stream", invert)`` requests until an ``"exit"`` message. Every
    drained batch ships back bit-packed (binary frames are 0/255, so
    packbits is lossless and 8x smaller over the pipe)."""
    import traceback

    try:
        import jax

        if platform:
            jax.config.update("jax_platforms", platform)
        from .binarize import Binarizer

        binarizer = Binarizer.from_config(Config(dict(cfg_values)),
                                          allow_random=allow_random,
                                          **binarizer_kwargs)
        if binarizer._packed_fn is None:
            raise ValueError("WorkerBinarizer requires force_binary=True")
        result_q.put(("ready", _vmrss_mb()))
        while True:
            msg = feed_q.get()
            if msg == "exit" or msg is None:
                return
            _, invert = msg
            source = _QueueSource(feed_q)
            for times, indices, frames in binarizer.stream_source(
                    source, 0, invert):
                bits, shape = _pack_result(frames)
                result_q.put(("batch", times, indices, bits, shape,
                              _vmrss_mb()))
            result_q.put(("done", dict(binarizer.stream_stats),
                          _vmrss_mb()))
    except BaseException:
        try:
            result_q.put(("error", traceback.format_exc()))
        except Exception:
            pass


def _drain_results(mp_q, rx, stop: threading.Event) -> None:
    """Forward every child result into an in-process queue.

    This thread exists to absorb the ONE indefinite block a
    ``multiprocessing.Queue.get`` can hit: a child SIGKILLed mid-write
    (the OOM regime this worker contains) leaves a partial pickle in the
    pipe — ``poll()`` sees data, so even ``get(timeout)`` enters
    ``recv_bytes`` and never returns (the parent's own copy of the pipe's
    write end keeps EOF from arriving). Only this disposable daemon
    thread can get stuck there; the parent reads ``rx`` (a plain
    ``queue.Queue``) with real timeouts and liveness checks."""
    while not stop.is_set():
        try:
            msg = mp_q.get(timeout=0.2)
        except queue_mod.Empty:
            continue
        except (EOFError, OSError):
            return
        rx.put(msg)


class WorkerBinarizer:
    """Drop-in for :class:`Binarizer`'s streaming surface
    (``stream_source`` / ``process_source``) that runs the device path in
    a recycled child process. See the module docstring for why.

    ``recycle_mb``: child-RSS budget; when a drained batch reports more,
    the current stream is cleanly split — the child drains its in-flight
    device batches, exits, and a fresh child resumes with the next frames.
    ``0`` disables recycling (one child for the whole run, still keeping
    the leak out of the parent). The results are bit-identical to the
    in-process Binarizer at ANY recycle granularity (tested).
    """

    def __init__(self, config: Config, recycle_mb: float = 0.0,
                 chunk_frames: int = _CHUNK_FRAMES,
                 allow_random: bool = False,
                 platform: Optional[str] = None,
                 binarizer_kwargs: Optional[dict] = None):
        self._cfg_values = dict(config._values)
        self.recycle_mb = float(recycle_mb)
        self.chunk_frames = max(1, int(chunk_frames))
        self.allow_random = allow_random
        self.binarizer_kwargs = dict(binarizer_kwargs or {})
        if platform is None:
            import jax

            platform = jax.config.jax_platforms  # None => auto, like parent
        self.platform = platform
        self.recycles = 0
        self.stream_stats = {}
        self._ctx = mp.get_context("spawn")
        self._child = None
        self._feed_q = None
        self._result_q = None
        self._rx = None          # in-process mirror of _result_q
        self._drain_stop = None

    @classmethod
    def from_config(cls, config: Config, allow_random: bool = False,
                    **kwargs) -> "WorkerBinarizer":
        kwargs.setdefault("recycle_mb",
                          config.get_float("DEVICE_WORKER_RECYCLE_MB", 0.0))
        kwargs.setdefault("chunk_frames",
                          config.get_int("DEVICE_WORKER_CHUNK_FRAMES",
                                         _CHUNK_FRAMES))
        return cls(config, allow_random=allow_random, **kwargs)

    # ------------------------------------------------------------ lifecycle

    def _spawn(self) -> None:
        self._feed_q = self._ctx.Queue(maxsize=_FEED_DEPTH)
        self._result_q = self._ctx.Queue(maxsize=_RESULT_DEPTH)
        self._rx = queue_mod.Queue()
        self._drain_stop = threading.Event()
        threading.Thread(target=_drain_results,
                         args=(self._result_q, self._rx, self._drain_stop),
                         daemon=True).start()
        self._child = self._ctx.Process(
            target=_child_main,
            args=(self._cfg_values, self.platform, self.allow_random,
                  self.binarizer_kwargs, self._feed_q, self._result_q),
            daemon=True)
        self._child.start()
        msg = self._get_result()
        if msg[0] != "ready":
            raise RuntimeError(f"device worker failed to start: {msg!r}")

    def close(self) -> None:
        """Exit the child cleanly (idempotent), without ever blocking
        unboundedly: on an abort mid-stream the feed queue can be FULL and
        the child can be blocked on a full RESULT queue — a blind blocking
        put here would deadlock against it. ``None`` is the close message
        for both child states (mid-stream it ends the in-flight stream,
        at the command loop it exits); results are drained so a blocked
        child can make progress toward it."""
        import time as time_mod

        if self._child is not None and self._child.is_alive():
            try:
                deadline = time_mod.monotonic() + 30.0
                while self._child.is_alive() and \
                        time_mod.monotonic() < deadline:
                    try:
                        self._feed_q.put_nowait(None)
                    except queue_mod.Full:
                        pass
                    try:
                        # keep the in-process mirror drained (the drainer
                        # thread keeps the mp result queue itself flowing,
                        # so a child blocked on a full result queue can
                        # make progress toward the exit message)
                        self._rx.get_nowait()
                    except queue_mod.Empty:
                        pass
                    self._child.join(timeout=0.25)
            finally:
                if self._child.is_alive():
                    self._child.terminate()
                    self._child.join(timeout=10)
                    if self._child.is_alive():
                        self._child.kill()
                        self._child.join(timeout=10)
        self._child = None
        if self._drain_stop is not None:
            self._drain_stop.set()
        for q in (self._feed_q, self._result_q):
            # cancel_join_thread: a child that died with the feed pipe
            # mid-write leaves the parent's feeder thread blocked forever;
            # without this, the queue finalizer would JOIN that thread at
            # interpreter exit and hang the process
            if q is not None:
                q.cancel_join_thread()
                q.close()
        self._feed_q = self._result_q = None

    def __del__(self):  # best effort — tests use close() explicitly
        try:
            self.close()
        except Exception:
            pass

    def _get_result(self, timeout: float = 3600.0):
        """Result get that notices a dead child instead of hanging. Reads
        the in-process mirror queue (see ``_drain_results``) — a plain
        ``queue.Queue`` whose timeouts are real even when the child was
        killed mid-write into the mp pipe."""
        deadline_step = 5.0
        waited = 0.0
        while True:
            try:
                msg = self._rx.get(timeout=deadline_step)
            except queue_mod.Empty:
                waited += deadline_step
                if not self._child.is_alive():
                    # the child's final message can still be mid-flush in
                    # its queue feeder thread when is_alive() flips — one
                    # bounded drain before declaring the result lost
                    try:
                        msg = self._rx.get(timeout=1.0)
                    except queue_mod.Empty:
                        raise RuntimeError(
                            "device worker died without reporting an error "
                            f"(exitcode {self._child.exitcode})")
                elif waited >= timeout:
                    raise RuntimeError(
                        f"device worker produced no result for {waited:.0f}s")
                else:
                    continue
            if msg[0] == "error":
                self.close()
                raise RuntimeError(f"device worker failed:\n{msg[1]}")
            return msg

    # ------------------------------------------------------------ streaming

    def stream_source(self, source: VideoFrameSource, frames_limit: int = 0,
                      invert: bool = True):
        """Same contract as Binarizer.stream_source: yields
        (times, indices, frames) per drained device batch, in order."""
        stats = self.stream_stats = {"source_s": 0.0, "dispatch_s": 0.0,
                                     "drain_s": 0.0, "downscale_s": 0.0,
                                     "recycles": 0}
        if self._child is None or not self._child.is_alive():
            self.close()  # retire dead-child queues + drainer, if any
            self._spawn()
        self._feed_q.put(("stream", invert))

        import time

        pc = time.perf_counter
        need_recycle = False
        frame_iter = source.frames(frames_limit)
        chunk_t: list = []
        chunk_i: list = []
        chunk_f: list = []

        def decode_next():
            t0 = pc()
            item = next(frame_iter, None)
            stats["source_s"] += pc() - t0
            return item

        def drain_one(block: bool):
            nonlocal need_recycle
            if block:
                msg = self._get_result()
            else:
                try:
                    msg = self._rx.get_nowait()
                except queue_mod.Empty:
                    return None
                if msg[0] == "error":
                    self.close()
                    raise RuntimeError(f"device worker failed:\n{msg[1]}")
            if msg[0] == "done":
                _, child_stats, rss = msg
                for key, val in child_stats.items():
                    if key != "source_s":  # child's source_s is queue wait
                        stats[key] = stats.get(key, 0.0) + val
                return "done"
            _, times, indices, bits, shape, rss = msg
            if self.recycle_mb and rss > self.recycle_mb:
                need_recycle = True
            return times, indices, _unpack_result(bits, shape)

        def feed(msg):
            """Queue put that keeps draining results — the child blocks on
            a full result queue, so a blind blocking put could deadlock.
            A child killed without an error message (e.g. OOM SIGKILL —
            exactly the regime this worker contains) leaves the feed queue
            full forever, so the Full path also checks liveness."""
            while True:
                try:
                    self._feed_q.put(msg, timeout=0.5)
                    return []
                except queue_mod.Full:
                    out = drain_one(block=False)
                    if out is not None and out != "done":
                        yield out
                    elif out is None and not self._child.is_alive():
                        time.sleep(0.2)  # let a mid-flush message land
                        out = drain_one(block=False)
                        if out is None:
                            raise RuntimeError(
                                "device worker died mid-stream (exitcode "
                                f"{self._child.exitcode})")
                        if out != "done":
                            yield out

        def end_stream():
            """EOS -> drain everything the child still owes this stream."""
            yield from feed(None)
            while True:
                out = drain_one(block=True)
                if out == "done":
                    break
                yield out

        item = decode_next()
        while item is not None:
            chunk_t.append(item[0])
            chunk_i.append(item[1])
            chunk_f.append(item[2])
            if len(chunk_t) == self.chunk_frames:
                yield from feed(("chunk", chunk_t, chunk_i,
                                 np.stack(chunk_f)))
                chunk_t, chunk_i, chunk_f = [], [], []
                out = drain_one(block=False)
                if out is not None and out != "done":
                    yield out
                if need_recycle:
                    yield from end_stream()
                    self.close()
                    self.recycles += 1
                    stats["recycles"] += 1
                    need_recycle = False
                    self._spawn()
                    self._feed_q.put(("stream", invert))
            item = decode_next()

        if chunk_t:
            yield from feed(("chunk", chunk_t, chunk_i, np.stack(chunk_f)))
        yield from end_stream()
        if need_recycle:
            # budget crossed in the final drain: retire the child now so
            # the next stream (e.g. the next lecture) starts fresh
            self.close()
            self.recycles += 1
            stats["recycles"] += 1

    def process_source(self, source: VideoFrameSource, frames_limit: int = 0,
                       invert: bool = True):
        frame_times: list = []
        frame_indices: list = []
        binaries: list = []
        for times, indices, frames in self.stream_source(source, frames_limit,
                                                         invert):
            frame_times.extend(times)
            frame_indices.extend(indices)
            binaries.extend(frames)
        return frame_times, frame_indices, binaries
