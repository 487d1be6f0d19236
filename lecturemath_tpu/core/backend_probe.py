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

    result = {}

    def _probe():
        try:
            import jax

            jax.devices()
            result["ok"] = True
        except Exception as err:    # noqa: BLE001 — reported, not dropped
            result["err"] = err

    thread = threading.Thread(target=_probe, daemon=True, name="lm-backend-probe")
    thread.start()
    thread.join(timeout=timeout_s)
    if result.get("ok"):
        return
    if "err" in result:
        raise BackendUnavailable(
            f"device backend failed to initialize: {result['err']} — "
            f"{_HINT}") from result["err"]
    raise BackendUnavailable(
        f"device backend init still hanging after {timeout_s:.0f} s "
        f"(tunnel outage?) — {_HINT}")
