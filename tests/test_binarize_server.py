"""Binarization serving surface: resident model, micro-batched concurrent
requests, fixed model bucket (no per-request recompiles), HTTP contract."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from lecturemath_tpu.models.fcn_lecturenet import FCNConfig, FCNLectureNet
from lecturemath_tpu.pipeline.binarize import Binarizer
from lecturemath_tpu.pipeline.server import BinarizeService, serve
from lecturemath_tpu.utils.synthetic import threshold_binarizer_variables

NET_CONFIG = FCNConfig(
    down_filters=(2, 3, 4, 5, 6), mid_filters=6,
    upsample_filters=(2, 3, 4, 5, 6), up_filters=(2, 3, 4, 5, 6),
    pixel_features=(3, 2), kernel_size=3, pixel_kernel_size=3)


def _frame(width=64, height=48, glyph=True):
    rgb = np.full((height, width, 3), 220, np.uint8)
    if glyph:
        rgb[10:20, 12:30] = 20   # dark -> ink under the threshold head
    return rgb


@pytest.fixture(scope="module")
def service():
    import jax.numpy as jnp

    model = FCNLectureNet(NET_CONFIG, dtype=jnp.float32)
    variables = threshold_binarizer_variables(NET_CONFIG)
    binarizer = Binarizer(model, variables, upload_format="rgb")
    service = BinarizeService(binarizer, model_size=(64, 48),
                              max_batch=4, batch_window_ms=50.0)
    yield service
    service.close()


def test_single_request_round_trip(service):
    binary = service.binarize_rgb(_frame())
    assert binary.shape == (48, 64)
    assert (binary[12:18, 14:28] == 0).all()      # glyph is ink
    assert (binary[0:8, 0:8] == 255).all()        # background stays


def test_resolution_adaptation_no_recompile(service):
    """Inputs at other resolutions resize through the fixed bucket and
    come back at their own size."""
    big = service.binarize_rgb(_frame(width=128, height=96))
    assert big.shape == (96, 128)
    # the glyph sits at the same absolute pixel coords (10:20, 12:30) and
    # must come back there after the bucket round trip
    assert (big[12:18, 14:28] == 0).mean() > 0.8   # glyph survives resize
    assert (big[40:96, 60:128] == 255).all()       # background stays


def test_concurrent_requests_micro_batch(service):
    """Six concurrent callers land in fewer device dispatches than
    requests (the 50 ms window aggregates them), and every caller gets
    its own correct frame back."""
    before = service.stats()
    results = [None] * 6

    def call(k):
        frame = _frame(glyph=(k % 2 == 0))
        results[k] = (k, service.binarize_rgb(frame))

    threads = [threading.Thread(target=call, args=(k,)) for k in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)

    for k, binary in results:
        assert binary is not None
        has_ink = (binary[12:18, 14:28] == 0).any()
        assert has_ink == (k % 2 == 0)            # per-caller frames
    after = service.stats()
    new_requests = after["requests"] - before["requests"]
    new_batches = after["batches"] - before["batches"]
    assert new_requests == 6
    assert new_batches < 6                         # batching happened
    assert after["mean_batch"] >= 1.0


def test_http_contract(service):
    import cv2

    server = serve(service, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["model_size"] == [64, 48]

        ok, payload = cv2.imencode(".png", _frame()[:, :, ::-1])
        assert ok
        request = urllib.request.Request(f"{base}/binarize",
                                         data=payload.tobytes(),
                                         method="POST")
        with urllib.request.urlopen(request, timeout=120) as r:
            binary = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                                  cv2.IMREAD_GRAYSCALE)
        assert (binary[12:18, 14:28] == 0).all()

        request = urllib.request.Request(f"{base}/binarize?invert=1",
                                         data=payload.tobytes(),
                                         method="POST")
        with urllib.request.urlopen(request, timeout=120) as r:
            inverted = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                                    cv2.IMREAD_GRAYSCALE)
        assert (inverted[12:18, 14:28] == 255).all()

        request = urllib.request.Request(f"{base}/binarize",
                                         data=b"not an image",
                                         method="POST")
        try:
            urllib.request.urlopen(request, timeout=10)
            raised = False
        except urllib.error.HTTPError as err:
            raised = err.code == 400
        assert raised

        with urllib.request.urlopen(f"{base}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1 and stats["uptime_s"] >= 0
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_hot_reload_swaps_weights_without_restart(tmp_path):
    """POST-style reload: a factory-built service swaps to a checkpoint
    with a different threshold and subsequent requests see the new
    weights; reload without a factory is a clear error."""
    import jax.numpy as jnp

    from lecturemath_tpu.pipeline.binarize import (load_checkpoint_variables,
                                                   save_checkpoint_variables)

    model = FCNLectureNet(NET_CONFIG, dtype=jnp.float32)
    normal = threshold_binarizer_variables(NET_CONFIG)
    # threshold near black: the (value 20) glyph is NOT ink any more
    blind = threshold_binarizer_variables(NET_CONFIG, threshold_gray=5.0)
    blind_path = str(tmp_path / "blind.msgpack")
    save_checkpoint_variables(blind, blind_path)

    def factory(checkpoint=None):
        variables = (normal if checkpoint is None
                     else load_checkpoint_variables(checkpoint))
        return Binarizer(model, variables, upload_format="rgb")

    service = BinarizeService(factory(), model_size=(64, 48), max_batch=2,
                              batch_window_ms=5.0,
                              binarizer_factory=factory)
    try:
        before = service.binarize_rgb(_frame())
        assert (before[12:18, 14:28] == 0).all()       # glyph is ink

        out = service.reload_checkpoint(blind_path)
        assert out["ok"] and service.stats()["reloads"] == 1

        after = service.binarize_rgb(_frame())
        assert (after == 255).all()                    # nothing under 5.0

        service.reload_checkpoint(None)                # back to factory
        again = service.binarize_rgb(_frame())
        np.testing.assert_array_equal(again, before)
    finally:
        service.close()

    no_factory = BinarizeService(factory(), model_size=(64, 48),
                                 max_batch=1, batch_window_ms=1.0,
                                 warmup=False)
    try:
        with pytest.raises(RuntimeError, match="binarizer_factory"):
            no_factory.reload_checkpoint(None)
    finally:
        no_factory.close()


def test_hot_reload_under_concurrent_traffic(tmp_path):
    """Requests keep succeeding WHILE a reload swaps the weights — the
    no-dropped-traffic claim: every response is valid output of either
    the old or the new model, never an error or a mix."""
    import threading

    import jax.numpy as jnp

    from lecturemath_tpu.pipeline.binarize import save_checkpoint_variables

    model = FCNLectureNet(NET_CONFIG, dtype=jnp.float32)
    normal = threshold_binarizer_variables(NET_CONFIG)
    blind = threshold_binarizer_variables(NET_CONFIG, threshold_gray=5.0)
    blind_path = str(tmp_path / "blind.msgpack")
    save_checkpoint_variables(blind, blind_path)

    def factory(checkpoint=None):
        from lecturemath_tpu.pipeline.binarize import \
            load_checkpoint_variables

        variables = (normal if checkpoint is None
                     else load_checkpoint_variables(checkpoint))
        return Binarizer(model, variables, upload_format="rgb")

    service = BinarizeService(factory(), model_size=(64, 48), max_batch=4,
                              batch_window_ms=2.0,
                              binarizer_factory=factory)
    try:
        frame = _frame()
        old = service.binarize_rgb(frame)
        results, errors = [], []

        def caller():
            for _ in range(12):
                try:
                    results.append(service.binarize_rgb(frame))
                except Exception as err:  # noqa: BLE001
                    errors.append(err)

        threads = [threading.Thread(target=caller) for _ in range(4)]
        for t in threads:
            t.start()
        service.reload_checkpoint(blind_path)   # swap mid-traffic
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        assert len(results) == 48
        new = service.binarize_rgb(frame)
        assert (new == 255).all()               # new weights in effect
        for out in results:                     # old XOR new, never a mix
            assert (out == old).all() or (out == new).all()
    finally:
        service.close()


def test_stuck_dispatch_fails_fast_and_flags_health():
    """A backend dying mid-serving leaves the worker hung inside a device
    dispatch; later callers must fail immediately (not each wait the full
    backstop) and /healthz must report unhealthy."""
    import time

    import jax.numpy as jnp

    model = FCNLectureNet(NET_CONFIG, dtype=jnp.float32)
    variables = threshold_binarizer_variables(NET_CONFIG)
    binarizer = Binarizer(model, variables, upload_format="rgb")
    service = BinarizeService(binarizer, model_size=(64, 48), max_batch=2,
                              batch_window_ms=1.0, warmup=False,
                              request_timeout_s=0.5)
    release = threading.Event()

    def hung_dispatch(frames, active=None):
        release.wait(30)
        raise RuntimeError("backend died")

    service._dispatch = hung_dispatch
    try:
        assert service.health()["ok"]
        with pytest.raises(RuntimeError, match="timed out"):
            service.binarize_rgb(_frame())      # first caller hits backstop

        # worker is now wedged past the threshold: health flips...
        deadline = time.monotonic() + 10
        while service.health()["ok"] and time.monotonic() < deadline:
            time.sleep(0.05)
        health = service.health()
        assert not health["ok"]
        assert health["dispatch_stuck_s"] >= 0.5

        # ...and new callers fail fast, well under the backstop
        start = time.monotonic()
        with pytest.raises(RuntimeError, match="stuck"):
            service.binarize_rgb(_frame())
        assert time.monotonic() - start < 0.3

        # HTTP surface: /healthz answers 503 while wedged
        server = serve(service, port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        host, port = server.server_address
        try:
            with pytest.raises(urllib.error.HTTPError) as excinfo:
                urllib.request.urlopen(f"http://{host}:{port}/healthz",
                                       timeout=10)
            assert excinfo.value.code == 503
            payload = json.loads(excinfo.value.read())
            assert payload["ok"] is False
        finally:
            server.shutdown()
            server.server_close()
    finally:
        release.set()                           # unwedge the worker
        service.close()


def test_backend_death_latches_unhealthy_until_recovery():
    """A dispatch dying of backend death (bounded fetch) must LATCH the
    service unhealthy — no flapping back to ok between failed dispatches
    — and a later successful dispatch un-latches it."""
    import jax.numpy as jnp

    from lecturemath_tpu.core.backend_probe import BackendUnavailable

    model = FCNLectureNet(NET_CONFIG, dtype=jnp.float32)
    variables = threshold_binarizer_variables(NET_CONFIG)
    binarizer = Binarizer(model, variables, upload_format="rgb")
    service = BinarizeService(binarizer, model_size=(64, 48), max_batch=2,
                              batch_window_ms=1.0, warmup=False,
                              request_timeout_s=30)
    real_dispatch = service._dispatch
    dead = {"on": True}

    def dispatch(frames, active=None):
        if dead["on"]:
            raise BackendUnavailable("device fetch hung for 1 s")
        return real_dispatch(frames, active)

    service._dispatch = dispatch
    try:
        with pytest.raises(BackendUnavailable):
            service.binarize_rgb(_frame())
        health = service.health()
        assert not health["ok"] and "fetch hung" in health["backend_dead"]
        # latched: new callers fail fast even though no dispatch is
        # in flight (stuck_s == 0)
        with pytest.raises(RuntimeError, match="unhealthy"):
            service.binarize_rgb(_frame())

        dead["on"] = False          # backend recovers
        # enqueue directly (binarize_rgb fails fast while latched; the
        # worker's next successful dispatch is what un-latches)
        import numpy as _np
        item = service._queue.put
        from lecturemath_tpu.pipeline.server import _WorkItem
        work = _WorkItem(_np.asarray(_frame()))
        item(work)
        assert work.event.wait(60) and work.error is None
        assert service.health()["ok"]
        assert service.binarize_rgb(_frame()).shape == (48, 64)
    finally:
        service.close()
