"""bench.py backend-probe robustness.

The axon backend raises OR hangs when down (observed multi-hour outages);
bench must still emit a parseable headline with the last-good numbers
attached. These tests exercise the probe helper and the last-good record
without a device. The probe subprocess pays a fresh interpreter: this
image's sitecustomize forces the axon platform whenever
PALLAS_AXON_POOL_IPS is set, so the tests clear it to steer the
subprocess onto cpu / a bogus backend deterministically.
"""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "lm_bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_subprocess_probe_succeeds_on_cpu(bench, monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    ok, err = bench._subprocess_probe(timeout_s=120)
    assert ok and err is None


def test_subprocess_probe_reports_bad_backend(bench, monkeypatch):
    """An unusable backend must come back as (False, message) — the raise
    path; the hang path is the timeout branch of the same helper."""
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "definitely_not_a_backend")
    ok, err = bench._subprocess_probe(timeout_s=120)
    assert not ok
    assert "unavailable" in err or "timed out" in err


def test_wait_for_backend_bounded_retry(bench, monkeypatch):
    """A failing backend must return the error within the deadline (no
    unbounded loop), and a working one must return None on the first try."""
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "definitely_not_a_backend")
    monkeypatch.setenv("LM_BENCH_PROBE_DEADLINE_S", "5")
    err = bench._wait_for_backend()
    assert err is not None

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("LM_BENCH_PROBE_DEADLINE_S", "120")
    assert bench._wait_for_backend() is None


def test_watchdog_emits_degraded_headline(tmp_path):
    """A backend dying mid-measurement must still yield a parseable
    degraded line (the watchdog fires, prints, flushes, exits 0)."""
    import subprocess
    import sys as _sys

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               LM_BENCH_WALL_DEADLINE_S="0.3")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = ("import sys, time; sys.path.insert(0, %r); import bench; "
            "bench._arm_watchdog(); time.sleep(60)" % REPO)
    res = subprocess.run([_sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert res.returncode == 0
    line = json.loads(res.stdout.strip().splitlines()[-1])
    assert "wall deadline" in line["error"]
    assert line["last_good"] and line["last_good"]["value"] > 0


def test_last_good_record_is_valid_headline_json(bench):
    """The record the degraded path embeds must parse and carry the
    headline keys (a malformed seed would silently drop to null). On a
    fresh checkout the untracked history file is absent and the loader
    falls back to the newest committed round snapshot — this validates
    whichever source is live."""
    rec = bench._load_last_good()
    assert rec is not None, "no last-good source (snapshot missing?)"
    for key in ("metric", "value", "unit", "vs_baseline",
                "stage01_device_fps", "mfu", "device"):
        assert key in rec, key
    assert rec["value"] and rec["value"] > 0


def test_update_last_good_carries_best_known(bench, monkeypatch, tmp_path):
    """The last-good record keeps the best median ever seen (with its own
    provenance) alongside the most recent run — a degraded round artifact
    then shows both the fresh number and the weather-independent ceiling."""
    path = str(tmp_path / "last_good.json")
    monkeypatch.setattr(bench, "LAST_GOOD_FILE", path)

    def headline(median, fps_dev):
        return {"metric": "m", "value": median, "median_e2e_fps": median,
                "runs_fps": [median], "stage01_device_fps": fps_dev,
                "mfu": 0.19, "vs_baseline": median * 5,
                "link_provenance": {"up_mbps": [10.0]}}

    bench._update_last_good(headline(34.4, 162.0))       # good weather
    returned = bench._update_last_good(headline(4.5, 129.0))  # bad weather
    rec = json.load(open(path))
    assert rec["median_e2e_fps"] == 4.5                  # most recent
    assert rec["best_known"]["median_e2e_fps"] == 34.4   # ceiling kept
    assert rec["best_known"]["stage01_device_fps"] == 162.0
    # the caller gets the written record back so the compact headline can
    # embed best_known when this run under-performed it
    assert returned["best_known"]["median_e2e_fps"] == 34.4

    bench._update_last_good(headline(40.0, 165.0))       # new best
    rec = json.load(open(path))
    assert rec["median_e2e_fps"] == 40.0
    assert rec["best_known"]["median_e2e_fps"] == 40.0

    # a corrupt/missing prior file must not break the write
    os.unlink(path)
    bench._update_last_good(headline(5.0, 130.0))
    rec = json.load(open(path))
    assert rec["best_known"]["median_e2e_fps"] == 5.0
