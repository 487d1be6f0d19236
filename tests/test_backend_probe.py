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
