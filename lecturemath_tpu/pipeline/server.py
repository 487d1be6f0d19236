"""Persistent binarization server: the framework's production serving
surface.

The reference's closest analog is a one-shot script
(reference: test_FCN_binarizer.py:1 — load checkpoint, binarize one file,
exit); re-designed serving-first for TPU:

  * the model stays RESIDENT and jit-warm — the checkpoint loads once,
    the first request pays the compile, every later request is a pure
    device dispatch;
  * requests are MICRO-BATCHED: concurrent requests arriving within a
    short window ride one device dispatch (the MXU prefers batch 8 over
    8x batch 1 — see bench.py's batch sweep), each caller gets its own
    frame back;
  * inputs are resized host-side to ONE fixed model bucket so XLA never
    sees a new shape (a new shape means a multi-second recompile mid-
    serving); outputs return at the caller's original resolution;
  * results leave the device BIT-PACKED (1 bit/pixel, the stage-01
    download optimization) and unpack on host — behind a slow
    host<->device link the binary download dominates request latency,
    and packing cuts it 8x.

Run via ``python -m lecturemath_tpu.cli.serve <config> [-port N]``;
programmatic use via BinarizeService. The HTTP contract:

  POST /binarize     image body (PNG/JPEG) -> binary PNG (ink=0 on 255,
                     the model's raw polarity; ``?invert=1`` flips to
                     ink=255 — the stage-01 artifact polarity)
  POST /reload       JSON {"checkpoint": optional path} -> hot-swap the
                     checkpoint WITHOUT dropping traffic: the new model
                     loads + warms every batch bucket off to the side,
                     then swaps in atomically between dispatches
  GET  /healthz      liveness + device + model bucket
  GET  /stats        request/batch counters, mean batch size, latency
"""

from __future__ import annotations

import threading
import time
from queue import Empty, Queue
from typing import Optional, Tuple

import numpy as np

from .binarize import Binarizer, resolve_model_size


class _WorkItem:
    __slots__ = ("frame", "event", "result", "error")

    def __init__(self, frame: np.ndarray):
        self.frame = frame
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None


class BinarizeService:
    """Thread-safe micro-batching front end over a resident Binarizer."""

    def __init__(self, binarizer: Binarizer,
                 model_size: Tuple[int, int] = (960, 540),
                 max_batch: int = 8, batch_window_ms: float = 5.0,
                 warmup: bool = True, binarizer_factory=None,
                 request_timeout_s: Optional[float] = None):
        self.binarizer = binarizer
        # optional callable (checkpoint_path_or_None) -> Binarizer, used
        # by reload_checkpoint to rebuild with fresh weights
        self._factory = binarizer_factory
        # (width, height) the model sees — same halving rule as stage 01
        self.model_size = resolve_model_size(*model_size)
        self.max_batch = max(1, int(max_batch))
        # jit traces per input shape, so micro-batches PAD to one of a few
        # power-of-two buckets (1, 2, 4, ..., max_batch) — bounded compile
        # count, all paid at warmup, never mid-serving
        self.batch_buckets = []
        bucket = 1
        while bucket < self.max_batch:
            self.batch_buckets.append(bucket)
            bucket *= 2
        self.batch_buckets.append(self.max_batch)
        self.batch_window_s = float(batch_window_ms) / 1000.0
        # per-request backstop AND the stuck-dispatch threshold: a device
        # backend that dies mid-serving leaves the worker hung inside a
        # dispatch — callers must not each wait the full backstop
        import os as _os

        self.request_timeout_s = float(
            request_timeout_s if request_timeout_s is not None
            else _os.environ.get("LM_SERVE_TIMEOUT_S", "600"))
        self._dispatch_started: Optional[float] = None
        # latched when a dispatch dies of backend death (the bounded
        # fetch raising BackendUnavailable): without the latch, health
        # would flap back to ok between failed dispatches on a dead
        # backend. Cleared by the next SUCCESSFUL dispatch or reload.
        self._backend_dead: Optional[str] = None
        self._queue: "Queue[Optional[_WorkItem]]" = Queue()
        self._closed = False
        self._stats_lock = threading.Lock()
        self._reload_lock = threading.Lock()
        self._stats = {"requests": 0, "batches": 0, "frames": 0,
                       "last_batch": 0, "last_latency_ms": 0.0,
                       "reloads": 0, "started": time.time()}
        # _active = (binarizer, use_packed): ONE attribute so the worker
        # reads a consistent pair and reload swaps it atomically
        self._active = (binarizer, self._prepare(binarizer))
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        if warmup:
            self._warm(self._active)

    def _prepare(self, binarizer: Binarizer) -> bool:
        """Fix up a binarizer's upload format for this service's bucket;
        returns whether the bit-packed download path is usable.

        Packed device output: 1 bit/pixel off the device, host unpack.
        yuv420 uploads (half the bytes up — what stage 01 ships behind a
        tunnel) are honored when the bucket satisfies I420's geometry;
        otherwise rebuild the packed fn for plain RGB uploads."""
        use_packed = binarizer._packed_fn is not None
        if use_packed and binarizer.upload_format == "yuv420":
            width, height = self.model_size
            if width % 2 or height % 4:
                from ..models.fcn_lecturenet import make_packed_binarizer

                binarizer.upload_format = "rgb"
                binarizer._packed_fn = make_packed_binarizer(
                    binarizer.model, binarizer.variables,
                    threshold=binarizer.threshold)
        return use_packed

    def _warm(self, active) -> None:
        """Pay every bucket's compile before the first caller sees it."""
        width, height = self.model_size
        for bucket in self.batch_buckets:
            frames = np.zeros((bucket, height, width, 3), np.uint8)
            self._dispatch(frames, active)

    # ------------------------------------------------------------- public

    def binarize_rgb(self, rgb: np.ndarray) -> np.ndarray:
        """uint8 RGB [H, W, 3] -> uint8 binary [H, W] at the input's
        resolution, ink=0 on 255 (model polarity). Blocking; safe to call
        from many threads — concurrent calls share device dispatches."""
        import cv2

        height, width = rgb.shape[:2]
        bucket_w, bucket_h = self.model_size
        if (width, height) != (bucket_w, bucket_h):
            resized = cv2.resize(rgb, (bucket_w, bucket_h),
                                 interpolation=cv2.INTER_AREA)
        else:
            resized = rgb
        if self._closed:
            raise RuntimeError("BinarizeService is closed")
        if self._backend_dead is not None:
            raise RuntimeError(
                f"serving unhealthy: {self._backend_dead}")
        stuck_s = self.dispatch_stuck_s()
        if stuck_s > self.request_timeout_s:
            # the worker is wedged inside a device dispatch (backend died
            # mid-serving) — fail NOW instead of queuing every caller into
            # its own full-timeout wait
            raise RuntimeError(
                f"serving unhealthy: device dispatch stuck for "
                f"{stuck_s:.0f} s (backend outage?)")
        item = _WorkItem(resized)
        self._queue.put(item)
        # re-check AFTER the put: close() may have set the flag and
        # drained the queue between our check and our put, in which case
        # nobody will ever serve this item — fail it here instead of
        # letting the caller block into the 600 s backstop
        if self._closed and not self._worker.is_alive() \
                and not item.event.is_set():
            item.error = RuntimeError("BinarizeService is closed")
            item.event.set()
        # backstop so a dying worker can never hang callers
        if not item.event.wait(timeout=self.request_timeout_s):
            raise RuntimeError(f"binarize request timed out "
                               f"({self.request_timeout_s:.0f} s)")
        if item.error is not None:
            raise item.error
        binary = item.result
        if binary.shape != (height, width):
            binary = cv2.resize(binary, (width, height),
                                interpolation=cv2.INTER_NEAREST)
        return binary

    def reload_checkpoint(self, checkpoint: Optional[str] = None) -> dict:
        """Hot-swap the model weights without dropping traffic: build a
        fresh Binarizer via the configured factory, warm every batch
        bucket through it (compiles + device placement happen off to the
        side while the current model keeps serving), then swap it in
        atomically between dispatches. Serialized: concurrent reloads
        queue behind each other."""
        if self._closed:
            raise RuntimeError("BinarizeService is closed")
        if self._factory is None:
            raise RuntimeError(
                "no binarizer_factory configured — construct "
                "BinarizeService(..., binarizer_factory=...) to enable "
                "checkpoint reloads")
        with self._reload_lock:
            new_binarizer = self._factory(checkpoint)
            active = (new_binarizer, self._prepare(new_binarizer))
            self._warm(active)
            self._active = active
            self.binarizer = new_binarizer
            self._backend_dead = None   # warm succeeded: backend alive
        with self._stats_lock:
            self._stats["reloads"] += 1
        return {"ok": True, "checkpoint": checkpoint}

    def dispatch_stuck_s(self) -> float:
        """Seconds the worker has been inside the CURRENT device dispatch
        (0.0 when idle/batching). Grows without bound when the backend
        hangs mid-dispatch — the health signal."""
        started = self._dispatch_started
        return time.monotonic() - started if started is not None else 0.0

    def health(self) -> dict:
        stuck_s = self.dispatch_stuck_s()
        return {"ok": (not self._closed
                       and stuck_s <= self.request_timeout_s
                       and self._backend_dead is None),
                "dispatch_stuck_s": round(stuck_s, 1),
                "backend_dead": self._backend_dead,
                "closed": self._closed}

    def stats(self) -> dict:
        with self._stats_lock:
            out = dict(self._stats)
        out["uptime_s"] = round(time.time() - out.pop("started"), 1)
        out["mean_batch"] = (round(out["frames"] / out["batches"], 2)
                             if out["batches"] else 0.0)
        return out

    def close(self) -> None:
        self._closed = True
        self._queue.put(None)
        self._worker.join(timeout=30)
        # error out any straggler enqueued between the flag and the drain
        self._fail_pending()
        if self._worker.is_alive():
            # the drain may have swallowed the worker's re-queued
            # shutdown sentinel (close during a long batch) — put one
            # back so the worker exits instead of blocking forever
            self._queue.put(None)

    def _fail_pending(self) -> None:
        """Error-out every queued request (shutdown paths); shutdown
        sentinels (None) are left out of the failure set."""
        while True:
            try:
                item = self._queue.get_nowait()
            except Empty:
                return
            if item is not None and not item.event.is_set():
                item.error = RuntimeError("BinarizeService closed")
                item.event.set()

    # ------------------------------------------------------------- worker

    def _dispatch(self, frames: np.ndarray, active=None) -> np.ndarray:
        """One device dispatch: uint8 RGB [B, H, W, 3] -> binary
        [B, H, W] ink=0/bg=255, via the bit-packed download when
        available. ``active`` pins a (binarizer, use_packed) pair (reload
        warms the incoming pair while the worker serves the current)."""
        binarizer, use_packed = active if active is not None \
            else self._active
        if not use_packed:
            return binarizer.binarize_frames(frames)
        from ..models.fcn_lecturenet import unpack_bits_host

        if binarizer.upload_format == "yuv420":
            from ..models.fcn_lecturenet import rgb_to_yuv420_host

            frames = rgb_to_yuv420_host(frames)
        device_packed = binarizer._packed_fn(binarizer._to_device(frames))
        host = binarizer._fetch(device_packed)
        return unpack_bits_host(host, self.model_size[0])

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                # closing: anything still queued will never be served
                self._fail_pending()
                return
            batch = [item]
            deadline = time.monotonic() + self.batch_window_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    extra = self._queue.get(timeout=remaining)
                except Empty:
                    break
                if extra is None:   # close() while batching: finish batch
                    self._queue.put(None)
                    break
                batch.append(extra)
            start = time.monotonic()
            self._dispatch_started = start
            try:
                # pad to the next batch bucket: only the warmed bucket
                # shapes ever reach jit (no mid-serving recompiles)
                bucket = next(b for b in self.batch_buckets
                              if b >= len(batch))
                frames = np.stack([entry.frame for entry in batch]
                                  + [batch[0].frame] * (bucket - len(batch)))
                binaries = self._dispatch(frames)
                for entry, binary in zip(batch, binaries):
                    entry.result = np.asarray(binary)
                self._backend_dead = None   # proof of life: un-latch
            except Exception as err:  # noqa: BLE001 — deliver to callers
                from ..core.backend_probe import BackendUnavailable

                if isinstance(err, BackendUnavailable):
                    self._backend_dead = str(err)
                for entry in batch:
                    entry.error = err
            finally:
                self._dispatch_started = None
            # stats BEFORE waking callers: a caller that returns and reads
            # stats() must see its own request counted
            latency_ms = (time.monotonic() - start) * 1e3
            with self._stats_lock:
                self._stats["requests"] += len(batch)
                self._stats["batches"] += 1
                self._stats["frames"] += len(batch)
                self._stats["last_batch"] = len(batch)
                self._stats["last_latency_ms"] = round(latency_ms, 1)
            for entry in batch:
                entry.event.set()


# --------------------------------------------------------------- HTTP UI

def make_handler(service: BinarizeService):
    import json

    import cv2
    import jax
    from http.server import BaseHTTPRequestHandler

    platform = jax.devices()[0].platform

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):  # quiet
            pass

        def _send(self, body: bytes, content_type: str = "application/json",
                  status: int = 200):
            self.send_response(status)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj, status: int = 200):
            self._send(json.dumps(obj).encode(), status=status)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                health = service.health()
                self._json({**health, "device": platform,
                            "model_size": list(service.model_size),
                            "max_batch": service.max_batch},
                           status=200 if health["ok"] else 503)
            elif self.path.startswith("/stats"):
                self._json(service.stats())
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path.startswith("/reload"):
                length = int(self.headers.get("Content-Length", 0))
                payload = self.rfile.read(length)
                try:
                    body = json.loads(payload or b"{}")
                    if not isinstance(body, dict):
                        raise ValueError("body must be a JSON object")
                    self._json(service.reload_checkpoint(
                        body.get("checkpoint")))
                except Exception as err:  # noqa: BLE001 — a failed
                    # reload (bad JSON, bad path, corrupt checkpoint)
                    # must answer 400, never drop the connection; the
                    # old model keeps serving either way
                    self._json({"ok": False, "error": str(err)},
                               status=400)
                return
            if not self.path.startswith("/binarize"):
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            payload = self.rfile.read(length)
            image = cv2.imdecode(np.frombuffer(payload, np.uint8),
                                 cv2.IMREAD_COLOR)
            if image is None:
                self._json({"ok": False,
                            "error": "body is not a decodable image"},
                           status=400)
                return
            try:
                binary = service.binarize_rgb(image[:, :, ::-1])
            except Exception as err:  # noqa: BLE001 — service errors
                # (closing, dispatch failure, timeout) must answer 503,
                # never drop the connection
                self._json({"ok": False, "error": str(err)}, status=503)
                return
            if "invert=1" in self.path:
                binary = 255 - binary
            ok, buffer = cv2.imencode(".png", binary)
            assert ok
            self._send(buffer.tobytes(), "image/png")

    return Handler


def serve(service: BinarizeService, port: int = 0):
    """Start the serving HTTP front end; returns the bound HTTPServer —
    call serve_forever() (blocking) or run it in a thread (tests)."""
    from http.server import ThreadingHTTPServer

    return ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))
