"""Stage 01 — batched FCN binarization of sampled lecture frames.

The reference runs one U-Net forward per frame at batch 1 with a host<->GPU
round trip and PNG encode per frame (reference: pre_ST3D_v3.0_01_binarize.py,
video_worker/FCN_lecturenet_binarizer.py:47-64). Here frames stream in fixed
batches through one jitted forward (bf16 on the MXU), with JAX's async
dispatch overlapping host decode with device compute.

Polarity: the raw model output follows the training GT (ink=0 on a 255
background); the stage artifact is inverted to ink=255 exactly like the
reference worker (FCN_lecturenet_binarizer.py:54) so downstream CC labeling
sees foreground ink as nonzero.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..models.convert import load_torch_checkpoint
from ..models.fcn_lecturenet import FCNConfig, FCNLectureNet, make_binarizer
from .video import VideoFrameSource


def resolve_model_size(width: int, height: int,
                       max_pixels: int = 2_500_000) -> Tuple[int, int]:
    """Halve dimensions while the pixel count exceeds the cap (reference:
    FCN_lecturenet.py:434-437). Returns the (width, height) the model sees."""
    while width * height > max_pixels:
        width = int(width / 2)
        height = int(height / 2)
    return width, height


_REMOTE_LINK = None


def remote_device_link() -> bool:
    """True when the device sits behind a remote transfer tunnel (axon) —
    host<->device bandwidth is then orders of magnitude below PCIe and
    stage 01 becomes transfer-bound."""
    global _REMOTE_LINK
    if _REMOTE_LINK is None:
        try:
            version = getattr(jax.devices()[0].client, "platform_version", "")
            _REMOTE_LINK = "axon" in str(version).lower()
        except Exception:
            _REMOTE_LINK = False
    return _REMOTE_LINK


def default_batch_size(width: int, height: int,
                       pixel_budget: int = 0, max_batch: int = 0) -> int:
    """Pick a batch size with roughly constant device memory footprint,
    adapted to the device link (the reference picks its frame-seek strategy
    by measuring, video_processor.py:100-146 — same idea here):

      * locally attached chip: big batches — MXU utilization keeps rising
        (batch 8 -> 96 was ~1.7x on v5e at 960x540; 192 OOMs a 16G chip)
      * remote tunnel (axon): smaller batches — stage 01 is transfer-bound
        and finer batches pipeline uploads/compute/downloads better

    Rounded to a multiple of 8; capped so tiny frames don't justify huge
    compiles."""
    if not pixel_budget:
        pixel_budget = 16_000_000 if remote_device_link() else 48_000_000
    if not max_batch:
        max_batch = 32 if remote_device_link() else 96
    batch = max(1, min(max_batch, pixel_budget // max(1, width * height)))
    if batch >= 8:
        batch -= batch % 8
    return batch


class _AsyncDrainer:
    """Background drain thread for ``Binarizer.stream_source``.

    In the synchronous stream, result downloads only progress while the
    generator is being pulled — any host work the CONSUMER does between
    batches (CC tracking, PNG encode) stops the fetch clock, so at scale
    wall ~= transfers + consumer work. This thread fetches batch k+1 while
    the consumer processes batch k: ``jax.device_get`` releases the GIL
    for the transfer, so the two genuinely overlap even on one core.

    Single-process only: in multi-process runs ``Binarizer._fetch`` issues
    a replicating collective, and two threads interleaving collective
    launches breaks the cross-process program order (deadlock risk) —
    ``Binarizer`` forces the synchronous path there.

    Yield order, values, and the in-flight bound (``depth`` batches beyond
    the one being drained) are identical to the synchronous path."""

    _DONE = object()

    def __init__(self, drain_fn, depth: int, stats: dict):
        import queue
        import threading

        self._drain_fn = drain_fn
        self._depth = depth
        self._stats = stats
        self._in = queue.Queue()
        self._out = queue.Queue(maxsize=depth + 2)
        self._stop = False
        self._inflight = 0
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="lm-stream-drain")
        self._thread.start()

    def _run(self):
        from time import perf_counter as pc
        while True:
            entry = self._in.get()
            if entry is self._DONE or self._stop:
                self._put(self._DONE)
                return
            t0 = pc()
            try:
                out = self._drain_fn(entry)
            except BaseException as exc:  # noqa: BLE001 — relayed to consumer
                self._put(("err", exc))
                return
            self._stats["drain_s"] += pc() - t0
            if not self._put(("ok", out)):
                return

    def _put(self, item) -> bool:
        """Bounded put that gives up if the consumer abandoned the stream
        (close() sets _stop) — never leaves this thread blocked forever."""
        import queue
        while not self._stop:
            try:
                self._out.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def _take(self):
        item = self._out.get()
        if item is self._DONE:
            raise RuntimeError("stream drain thread exited early")
        tag, val = item
        if tag == "err":
            self._stop = True
            raise val
        self._inflight -= 1
        return val

    def push(self, entry):
        """Queue one in-flight entry; returns [result] when the in-flight
        bound forces a drain (same cadence as the synchronous path)."""
        self._in.put(entry)
        self._inflight += 1
        if self._inflight > self._depth:
            return [self._take()]
        return []

    def finish(self):
        """Yield the remaining in-flight results in order."""
        self._in.put(self._DONE)
        while True:
            item = self._out.get()
            if item is self._DONE:
                return
            tag, val = item
            if tag == "err":
                raise val
            yield val

    def close(self):
        """Abandonment path (consumer broke out of the generator): unblock
        and discard; the daemon thread exits on its next queue interaction."""
        import queue
        self._stop = True
        self._in.put(self._DONE)
        try:
            while True:
                self._out.get_nowait()
        except queue.Empty:
            pass


class Binarizer:
    """Batched TPU binarizer for a stream of RGB frames."""

    def __init__(self, model: FCNLectureNet, variables,
                 batch_size: Optional[int] = None, force_binary: bool = True,
                 threshold: int = 128,
                 pipeline_depth: Optional[int] = None, mesh=None,
                 fold_bn: bool = True, s2d_heads: bool = True,
                 upload_format: str = "auto", downscale: str = "host",
                 downscale_filter: str = "lanczos",
                 max_model_pixels: int = 2_500_000,
                 async_drain: Optional[bool] = None):
        """``mesh`` (jax.sharding.Mesh with 'data'/'model' axes) shards the
        frame axis across chips — params replicate (or channel-shard over
        'model' when that axis is >1) and GSPMD inserts the collectives.
        Single-mesh and no-mesh runs produce identical frames.

        ``fold_bn`` (default): fold BatchNorm affines into the conv weights
        for inference (models.fcn_lecturenet.fold_batch_norms).
        ``s2d_heads`` (default): compute the narrow full-res head convs in
        space-to-depth domain (same math, less MXU lane padding). Both are
        numerically equivalent graph rewrites of the same parameters.

        ``upload_format``: 'rgb' ships raw uint8 RGB to the device;
        'yuv420' converts to I420 planes on host and reconstructs RGB on
        device (half the upload bytes — what the video codec stored
        anyway; differs from the RGB path only by BT.601 chroma rounding).
        'auto' picks yuv420 behind a remote transfer tunnel where stage 01
        is upload-bandwidth-bound, rgb otherwise. Config: UPLOAD_FORMAT.

        ``downscale``: where the >2.5MP halving (resolve_model_size) runs.
        'host' (default) halves before upload — reference-parity PIL
        LANCZOS filter, and 4x fewer bytes up the link per halving.
        'device' uploads full-res frames and box-halves on chip
        (device_halve; packed path only) — frees the 1-core host at the
        cost of 4x upload bytes; right only when host CPU, not link
        bandwidth, is the bottleneck (measured A/B: bench.py --1080p).
        Config: DOWNSCALE_PLACEMENT.

        ``downscale_filter``: host filter — 'lanczos' (reference parity,
        FCN_lecturenet.py:436) or 'area' (cv2 INTER_AREA, ~10x faster on
        this host; output may differ from the reference near glyph edges).
        Config: DOWNSCALE_FILTER.

        ``max_model_pixels``: the halving cap. The reference hardcodes
        2.5 MP (FCN_lecturenet.py:434) — note 1920x1080 is 2.07 MP, so
        real lectures run the net at FULL resolution there. Lowering the
        cap (e.g. to 2_000_000) trades fidelity for ~4x speed per halving.
        Config: BINARIZATION_MAX_PIXELS.

        ``async_drain`` (default: on for single-process runs): drain
        stream results on a background thread so transfers overlap the
        consumer's host work between batches (see _AsyncDrainer). Yield
        order and values are identical. Forced OFF when
        jax.process_count() > 1 — the replicating fetch is a collective
        and must stay in cross-process program order.
        Config: STREAM_ASYNC_DRAIN."""
        want_fold = fold_bn and not model.fold_bn and "batch_stats" in variables
        want_s2d = s2d_heads and not model.s2d_heads
        if want_fold or want_s2d:
            if want_fold:
                from ..models.fcn_lecturenet import fold_batch_norms

                variables = fold_batch_norms(variables)
            model = FCNLectureNet(model.config,
                                  reconstruction_mode=model.reconstruction_mode,
                                  dtype=model.dtype,
                                  fold_bn=model.fold_bn or want_fold,
                                  s2d_heads=model.s2d_heads or want_s2d,
                                  heads_block=model.heads_block)
        self.model = model
        self.mesh = mesh
        self._input_sharding = None
        self._replicate_fn = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import replicate, shard_params

            if mesh.shape.get("model", 1) > 1:
                params = shard_params(mesh, variables["params"])
            else:
                params = replicate(mesh, variables["params"])
            sharded = {"params": params}
            if "batch_stats" in variables:
                sharded["batch_stats"] = replicate(mesh,
                                                   variables["batch_stats"])
            variables = sharded
            self._input_sharding = NamedSharding(mesh, P("data"))
            data_size = mesh.shape["data"]
            if batch_size is not None:
                batch_size = -(-batch_size // data_size) * data_size
        self.variables = variables
        self.batch_size = batch_size
        self.force_binary = force_binary
        self.threshold = threshold
        # in-flight device batches: deeper queues hide dispatch/transfer
        # latency. Behind the remote tunnel the upload of batch k+1..k+3
        # must overlap batch k's compute+download to keep the link saturated
        # (measured: depth 4 vs 2 is ~15% on stage-01 wall); locally depth 2
        # suffices and keeps in-flight memory minimal.
        if pipeline_depth is None:
            pipeline_depth = 4 if remote_device_link() else 2
        self.pipeline_depth = max(1, pipeline_depth)
        self._binarize_fn = make_binarizer(model, variables,
                                           force_binary=force_binary,
                                           threshold=threshold)
        # streaming stage-01 path: binary-only output packed to a bitmap on
        # device (8x smaller host download, the tunnel/PCIe bottleneck)
        if not force_binary:
            upload_format = "rgb"  # full-output path stays RGB
        elif upload_format == "auto":
            upload_format = "yuv420" if remote_device_link() else "rgb"
        if upload_format not in ("rgb", "yuv420"):
            raise ValueError(f"unknown upload format: {upload_format!r}")
        self.upload_format = upload_format
        if downscale not in ("host", "device"):
            raise ValueError(f"unknown downscale placement: {downscale!r}")
        if downscale_filter not in ("lanczos", "area"):
            raise ValueError(f"unknown downscale filter: {downscale_filter!r}")
        if downscale == "device" and not force_binary:
            downscale = "host"  # full-output path keeps host-side parity
        self.downscale = downscale
        self.downscale_filter = downscale_filter
        self.max_model_pixels = max_model_pixels
        if async_drain is None:
            async_drain = True
        self.async_drain = bool(async_drain) and jax.process_count() == 1
        if force_binary:
            from ..models.fcn_lecturenet import make_packed_binarizer

            self._packed_fn = make_packed_binarizer(
                model, variables, threshold=threshold,
                input_format=upload_format)
            self._packed_fn_key = (upload_format, 0)
        else:
            self._packed_fn = None
            self._packed_fn_key = None

    @classmethod
    def from_config(cls, config: Config, allow_random: bool = False,
                    dtype=jnp.bfloat16, **kwargs) -> "Binarizer":
        """Load the model named by BINARIZATION_FCN_LECTURENET_DIR/FILENAME
        (torch checkpoints are converted on load; .msgpack/orbax dirs are
        restored natively)."""
        import os

        net_config = FCNConfig.from_config(config)
        model = FCNLectureNet(net_config, dtype=dtype)
        kwargs.setdefault("upload_format",
                          config.get_str("UPLOAD_FORMAT", "auto"))
        kwargs.setdefault("downscale",
                          config.get_str("DOWNSCALE_PLACEMENT", "host"))
        kwargs.setdefault("downscale_filter",
                          config.get_str("DOWNSCALE_FILTER", "lanczos"))
        kwargs.setdefault("max_model_pixels",
                          config.get_int("BINARIZATION_MAX_PIXELS",
                                         2_500_000))
        kwargs.setdefault("async_drain",
                          config.get_bool("STREAM_ASYNC_DRAIN", True))

        model_dir = config.get_str("BINARIZATION_FCN_LECTURENET_DIR", "models")
        model_file = config.get_str("BINARIZATION_FCN_LECTURENET_FILENAME",
                                    "LectureNet_model_BIN.dat")
        # the reference resolves the model dir under OUTPUT_PATH
        # (pre_ST3D_v3.0_01_binarize.py:24-26); an absolute model dir wins
        # either way because os.path.join discards earlier components then
        output_path = config.get_str("OUTPUT_PATH", "")
        candidates = [os.path.join(output_path, model_dir, model_file),
                      os.path.join(model_dir, model_file)]
        path = next((p for p in candidates if os.path.exists(p)),
                    candidates[0])

        if os.path.exists(path):
            variables = load_checkpoint_variables(path)
        elif allow_random:
            from ..models.fcn_lecturenet import init_variables

            variables = init_variables(
                model, jax.random.PRNGKey(0),
                (1, 64, 64, net_config.in_channels))
        else:
            raise FileNotFoundError(f"model checkpoint not found: {path}")

        return cls(model, variables, **kwargs)

    # ------------------------------------------------------------ inference

    def _to_device(self, frames):
        """Multi-process contract: every host passes the SAME global batch
        (all hosts decode the same video); this host's contiguous row share
        is sliced out here, so each frame is computed exactly once across
        the pod."""
        if self._input_sharding is None:
            return jnp.asarray(frames)
        from ..parallel.mesh import local_row_slice, put_with_sharding

        frames = np.asarray(frames)
        if jax.process_count() > 1:
            frames = frames[local_row_slice(self._input_sharding.mesh,
                                len(frames))]
        return put_with_sharding(frames, self._input_sharding)

    def _fetch(self, array) -> np.ndarray:
        """device_get that also works on multi-process global arrays: the
        output is all-gathered to a fully-replicated layout first (the
        packed binary is ~HW/8 bytes per frame, so replication is cheap),
        and EVERY host receives all frames — the host-side stages
        (tracking, artifacts, export) then proceed identically on each.

        Bounded: a backend dying MID-RUN leaves device_get hung forever
        (observed mid-round outages); the get runs on a daemon thread with
        a generous deadline (LM_FETCH_TIMEOUT_S, default 900 s — the first
        fetch pays the full compile, minutes through a remote-compile
        tunnel; 0 disables) and raises an actionable error instead of
        silently stalling the lecture run."""
        if jax.process_count() > 1 and not array.is_fully_addressable:
            if self._replicate_fn is None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._replicate_fn = jax.jit(
                    lambda x: x,
                    out_shardings=NamedSharding(self.mesh, P()))
            array = self._replicate_fn(array)
        import os

        timeout_s = float(os.environ.get("LM_FETCH_TIMEOUT_S", "900"))
        if timeout_s <= 0:
            return np.asarray(jax.device_get(array))
        from ..core.backend_probe import (BackendUnavailable,
                                          call_with_deadline)

        try:
            value = call_with_deadline(lambda: jax.device_get(array),
                                       timeout_s, "device fetch")
        except BackendUnavailable:
            raise BackendUnavailable(
                f"device fetch hung for {timeout_s:.0f} s (backend died "
                f"mid-run?) — re-run this stage when the backend recovers, "
                f"or set LM_FETCH_TIMEOUT_S to adjust/disable this "
                f"deadline") from None
        return np.asarray(value)

    def binarize_frames(self, frames: np.ndarray) -> np.ndarray:
        """uint8 RGB [B, H, W, 3] -> uint8 binary [B, H, W] in the raw model
        polarity (a trained model emits ink=0 on a 255 background). In
        multi-process runs every host passes the same global batch and
        receives the full output (see _to_device/_fetch)."""
        binary, _, _ = self._binarize_fn(self._to_device(frames))
        return self._fetch(binary)

    def stream_source(self, source: VideoFrameSource, frames_limit: int = 0,
                      invert: bool = True):
        """Generator over drained batches: yields (times, indices, frames)
        with up to ``pipeline_depth`` batches still in flight on the device.
        Consumers doing host work between batches (CC tracking, PNG encode)
        overlap it with device compute — express wall-clock approaches
        max(host, device) instead of their sum."""
        import time

        from ..models.fcn_lecturenet import unpack_bits_host

        first = None
        model_size = None
        full_size = None
        use_packed = self._packed_fn is not None
        pending = []  # (device_result, batch) — drained behind for overlap
        # per-phase wall accounting for the last stream (observability:
        # where stage-01 time goes — host decode/batch, upload+dispatch,
        # result download+unpack). Read via self.stream_stats after a run.
        stats = self.stream_stats = {"source_s": 0.0, "dispatch_s": 0.0,
                                     "drain_s": 0.0, "downscale_s": 0.0}
        pc = time.perf_counter

        def drain(entry):
            device_binary, batch = entry
            host = self._fetch(device_binary)
            if use_packed:
                host = unpack_bits_host(host, model_size[0])
            frames = []
            for offset in range(batch.valid):
                img = host[offset]
                if model_size != full_size:
                    import cv2
                    img = cv2.resize(img, full_size,
                                     interpolation=cv2.INTER_NEAREST)
                if invert:
                    img = 255 - img
                frames.append(img)
            return batch.times, batch.indices, frames

        # async drain: a background thread fetches batch k+1 while the
        # consumer's host work (tracking, encode) runs on batch k — the
        # synchronous path only progresses downloads while the generator
        # is being pulled. Same yield order/values; see _AsyncDrainer.
        drainer = (_AsyncDrainer(drain, self.pipeline_depth, stats)
                   if self.async_drain else None)
        if drainer is not None:
            stats["drain_async"] = 1.0
        try:
            batches = self._batched(source, frames_limit)
            while True:
                t0 = pc()
                batch = next(batches, None)
                stats["source_s"] += pc() - t0
                if batch is None:
                    break
                if first is None:
                    first = batch
                    h, w = batch.frames.shape[1:3]
                    full_size = (w, h)
                    model_size = resolve_model_size(w, h, self.max_model_pixels)
                    device_halvings = 0
                    if (self.downscale == "device" and use_packed and
                            model_size != full_size):
                        dw, dh = full_size
                        while dw * dh > self.max_model_pixels:
                            dw, dh = int(dw / 2), int(dh / 2)
                            device_halvings += 1
                    # I420 needs even width and height % 4 at the UPLOAD size
                    # (full-res when the halving runs on device) — the U/V
                    # planes must reshape to (H/2, W/2) from H/4 buffer rows
                    upload_size = full_size if device_halvings else model_size
                    if self.upload_format == "yuv420" and \
                            (upload_size[0] % 2 or upload_size[1] % 4):
                        self.upload_format = "rgb"
                    # rebuild key tracks BOTH the upload format and the on-device
                    # halving count: a reused Binarizer must not keep a halving
                    # fn for a later stream that needs none (or vice versa), and
                    # an unchanged key must not re-jit (a fresh jit object means
                    # a full retrace+compile per lecture)
                    if use_packed and \
                            self._packed_fn_key != (self.upload_format,
                                                    device_halvings):
                        from ..models.fcn_lecturenet import make_packed_binarizer

                        self._packed_fn = make_packed_binarizer(
                            self.model, self.variables, threshold=self.threshold,
                            input_format=self.upload_format,
                            pre_halvings=device_halvings)
                        self._packed_fn_key = (self.upload_format,
                                               device_halvings)

                frames = batch.frames
                if model_size != full_size and not device_halvings:
                    t0 = pc()
                    frames = _downscale_batch(frames, model_size,
                                              self.downscale_filter)
                    stats["downscale_s"] += pc() - t0

                if use_packed and self.upload_format == "yuv420":
                    from ..models.fcn_lecturenet import rgb_to_yuv420_host

                    t0 = pc()
                    frames = rgb_to_yuv420_host(frames)
                    stats["source_s"] += pc() - t0

                t0 = pc()
                if use_packed:
                    device_binary = self._packed_fn(self._to_device(frames))
                else:
                    device_binary, _, _ = self._binarize_fn(self._to_device(frames))
                stats["dispatch_s"] += pc() - t0
                if drainer is not None:
                    for out in drainer.push((device_binary, batch)):
                        yield out
                else:
                    pending.append((device_binary, batch))
                    if len(pending) > self.pipeline_depth:
                        t0 = pc()
                        out = drain(pending.pop(0))
                        stats["drain_s"] += pc() - t0
                        yield out

            if drainer is not None:
                yield from drainer.finish()
            else:
                for entry in pending:
                    t0 = pc()
                    out = drain(entry)
                    stats["drain_s"] += pc() - t0
                    yield out
        finally:
            if drainer is not None:
                drainer.close()

    def process_source(self, source: VideoFrameSource, frames_limit: int = 0,
                       invert: bool = True):
        """Run the full stage over a frame source.

        Returns (frame_times, frame_indices, binary_frames) where
        binary_frames is a list of uint8 [H, W] arrays; with ``invert`` the
        frames match the reference stage-01 artifact polarity (ink=255,
        ready for CC labeling).
        """
        frame_times: List[float] = []
        frame_indices: List[int] = []
        binaries: List[np.ndarray] = []
        for times, indices, frames in self.stream_source(source, frames_limit,
                                                         invert):
            frame_times.extend(times)
            frame_indices.extend(indices)
            binaries.extend(frames)
        return frame_times, frame_indices, binaries

    def _batched(self, source: VideoFrameSource, frames_limit: int):
        batch_size = self.batch_size
        if batch_size is None:
            # peek the first frame to size batches by pixel budget
            frame_iter = source.frames(frames_limit)
            try:
                first = next(frame_iter)
            except StopIteration:
                return
            h, w = first[2].shape[:2]
            mw, mh = resolve_model_size(w, h, self.max_model_pixels)
            batch_size = default_batch_size(mw, mh)
            if self.mesh is not None:
                data_size = self.mesh.shape["data"]
                batch_size = -(-batch_size // data_size) * data_size
            self.batch_size = batch_size

            import itertools

            chained = itertools.chain([first], frame_iter)
            buffer = []
            for item in chained:
                buffer.append(item)
                if len(buffer) == batch_size:
                    yield source._pack(buffer, batch_size, True)
                    buffer = []
            if buffer:
                yield source._pack(buffer, batch_size, True)
            return

        yield from source.batches(batch_size, frames_limit)


def _downscale_batch(frames: np.ndarray, model_size: Tuple[int, int],
                     filter: str = "lanczos") -> np.ndarray:
    """Iterative halving on host. ``filter='lanczos'`` matches the
    reference's PIL resize (FCN_lecturenet.py:436 uses PIL.Image.LANCZOS);
    'area' uses cv2 INTER_AREA (box mean) — ~10x faster per frame on this
    1-core host, pixel values differ slightly near edges."""
    import cv2
    from PIL import Image

    out = np.empty((frames.shape[0], model_size[1], model_size[0], 3), np.uint8)
    for k in range(frames.shape[0]):
        if filter == "area":
            img = frames[k]
            while img.shape[0] * img.shape[1] > model_size[0] * model_size[1]:
                img = cv2.resize(img, (img.shape[1] // 2, img.shape[0] // 2),
                                 interpolation=cv2.INTER_AREA)
            out[k] = img
            continue
        img = Image.fromarray(frames[k])
        # halve until the pixel count reaches the target's — model_size
        # (from resolve_model_size) is the single source of the halving
        # rule, so the two can't drift apart
        while img.size[0] * img.size[1] > model_size[0] * model_size[1]:
            img = img.resize((img.size[0] // 2, img.size[1] // 2),
                             Image.LANCZOS)
        out[k] = np.asarray(img)
    return out


def load_checkpoint_variables(path: str):
    """Load model variables from a torch .dat/.pth state_dict or a flax
    msgpack file."""
    if path.endswith((".msgpack", ".flax")):
        import flax.serialization

        with open(path, "rb") as f:
            return flax.serialization.msgpack_restore(f.read())
    return load_torch_checkpoint(path)


def save_checkpoint_variables(variables, path: str) -> None:
    import flax.serialization

    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(
            jax.tree.map(np.asarray, variables)))
