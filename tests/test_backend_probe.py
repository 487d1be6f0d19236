"""Fail-fast backend probe: device CLIs must turn a raising OR hanging
backend init into one actionable error instead of a silent hang
(observed multi-hour tunnel outages)."""

import time

import jax
import pytest

from lecturemath_tpu.core.backend_probe import (BackendUnavailable,
                                                ensure_backend)


def test_healthy_backend_passes():
    ensure_backend(timeout_s=60)    # cpu backend (conftest) inits instantly


def test_raising_backend_is_reported(monkeypatch):
    def boom():
        raise RuntimeError("UNAVAILABLE: tunnel down")

    monkeypatch.setattr(jax, "devices", boom)
    with pytest.raises(BackendUnavailable, match="failed to initialize"):
        ensure_backend(timeout_s=5)
    with pytest.raises(BackendUnavailable, match="JAX_PLATFORMS=cpu"):
        ensure_backend(timeout_s=5)     # the hint names the workaround


def test_hanging_backend_times_out(monkeypatch):
    def hang():
        time.sleep(30)

    monkeypatch.setattr(jax, "devices", hang)
    start = time.time()
    with pytest.raises(BackendUnavailable, match="hanging"):
        ensure_backend(timeout_s=0.3)
    assert time.time() - start < 5      # bounded, not the full sleep


def test_multihost_contract_skips_the_probe(monkeypatch):
    """jax.distributed.initialize() must run before ANY backend touch —
    when the LM_COORDINATOR contract is set the probe must not call
    jax.devices() at all, or every multi-host CLI run would crash in the
    distributed join."""
    def boom():
        raise RuntimeError("probe must not touch the backend")

    monkeypatch.setattr(jax, "devices", boom)
    monkeypatch.setenv("LM_COORDINATOR", "127.0.0.1:9999")
    ensure_backend(timeout_s=5)     # returns without touching jax


def test_probe_opt_out(monkeypatch):
    def boom():
        raise RuntimeError("should never be called")

    monkeypatch.setattr(jax, "devices", boom)
    ensure_backend(timeout_s=0)         # explicit skip
    monkeypatch.setenv("LM_DEVICE_PROBE_TIMEOUT_S", "0")
    ensure_backend()                    # env skip


def test_binarizer_fetch_is_bounded(monkeypatch):
    """A backend dying mid-run leaves device_get hung — the Binarizer's
    fetch must raise an actionable error, not stall the lecture run."""
    import time

    import jax.numpy as jnp

    from lecturemath_tpu.core.backend_probe import BackendUnavailable
    from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig,
                                                       FCNLectureNet)
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.utils.synthetic import threshold_binarizer_variables

    config = FCNConfig(down_filters=(2, 3, 4, 5, 6), mid_filters=6,
                       upsample_filters=(2, 3, 4, 5, 6),
                       up_filters=(2, 3, 4, 5, 6), pixel_features=(3, 2),
                       kernel_size=3, pixel_kernel_size=3)
    model = FCNLectureNet(config, dtype=jnp.float32)
    binarizer = Binarizer(model, threshold_binarizer_variables(config),
                          upload_format="rgb")
    array = jnp.zeros((2, 2))
    # healthy path first (also compiles nothing: plain device_get)
    assert binarizer._fetch(array).shape == (2, 2)

    def hang(_):
        time.sleep(30)

    monkeypatch.setattr(jax, "device_get", hang)
    monkeypatch.setenv("LM_FETCH_TIMEOUT_S", "0.3")
    start = time.time()
    with pytest.raises(BackendUnavailable, match="fetch hung"):
        binarizer._fetch(array)
    assert time.time() - start < 5

    monkeypatch.setenv("LM_FETCH_TIMEOUT_S", "5")

    def boom(_):
        raise RuntimeError("transport dead")

    monkeypatch.setattr(jax, "device_get", boom)
    with pytest.raises(RuntimeError, match="transport dead"):
        binarizer._fetch(array)
