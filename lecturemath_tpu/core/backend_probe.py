"""Fail fast when the device backend is unreachable.

The tunneled TPU backend on this rig has been observed both to RAISE
("Unable to initialize backend ... UNAVAILABLE") and to HANG indefinitely
at first init — multi-hour outages mid-run. A device CLI that silently
hangs at its first jax call is indistinguishable from a slow compile, so
the device-touching entry points probe backend init on a daemon thread
with a deadline first and turn both failure modes into one actionable
error. (bench.py uses the same pattern, with subprocess retries, for the
round artifact; the reference has no analog — its failure mode was a
torch CUDA error, reference: pre_ST3D_v3.0_01_binarize.py:36.)

The probe is near-free on a healthy backend (first init happens now
instead of moments later) and skippable with LM_DEVICE_PROBE_TIMEOUT_S=0.
"""

from __future__ import annotations

import os
import threading

_HINT = ("retry when the backend recovers, or run host-only stages with "
         "JAX_PLATFORMS=cpu (clear PALLAS_AXON_POOL_IPS first during "
         "outages)")


class BackendUnavailable(RuntimeError):
    """Device backend failed to initialize within the probe deadline."""


def call_with_deadline(fn, timeout_s: float, description: str):
    """Run ``fn()`` on a daemon thread with a deadline.

    Returns fn's value; re-raises fn's exception; raises
    BackendUnavailable("<description> still hanging after N s") when the
    deadline passes. The single home of the probe idiom — a hung backend
    call cannot be interrupted, only abandoned (the daemon thread dies
    with the process)."""
    result = {}

    def _run():
        try:
            result["value"] = fn()
        except Exception as err:    # noqa: BLE001 — re-raised below
            result["error"] = err

    thread = threading.Thread(target=_run, daemon=True,
                              name="lm-deadline-call")
    thread.start()
    thread.join(timeout=timeout_s)
    if "value" in result:
        return result["value"]
    if "error" in result:
        raise result["error"]
    raise BackendUnavailable(
        f"{description} still hanging after {timeout_s:.0f} s")


def ensure_backend(timeout_s: float = None) -> None:
    """Initialize the jax backend, bounded by a deadline.

    Raises BackendUnavailable when init raises or is still hanging after
    ``timeout_s`` (default: LM_DEVICE_PROBE_TIMEOUT_S env, else 120 s;
    <= 0 skips the probe entirely). On success the backend is warm and
    every later jax call proceeds as usual.
    """
    if os.environ.get("LM_COORDINATOR"):
        # multi-host contract: jax.distributed.initialize() must run
        # BEFORE anything (including this probe's jax.devices()) touches
        # the XLA backend, or it raises. The distributed join has its own
        # coordination timeouts; skip the single-host probe entirely.
        return
    if timeout_s is None:
        timeout_s = float(os.environ.get("LM_DEVICE_PROBE_TIMEOUT_S", "120"))
    if timeout_s <= 0:
        return

    def _probe():
        import jax

        jax.devices()

    try:
        call_with_deadline(_probe, timeout_s, "device backend init")
    except BackendUnavailable as err:
        raise BackendUnavailable(f"{err} (tunnel outage?) — {_HINT}") \
            from None
    except Exception as err:    # noqa: BLE001 — reported, not dropped
        raise BackendUnavailable(
            f"device backend failed to initialize: {err} — {_HINT}") \
            from err
