"""Benchmark: frames/sec/chip for the binarize -> CC -> summary pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} with a
per-stage breakdown, device-only forward fps, and computed MFU.

Workload: a synthetic 960x540 lecture, 128 frames, 3 boards x 40 glyphs
(no released weights or videos ship with the reference). The model runs the
FULL production compute shape (widths 48..768) with heads surgically set so
the binarization logit is a deterministic luminance threshold
(utils.synthetic.threshold_binarizer_variables) — so stages 02-05 process
the model's OWN stage-01 output with a realistic CC workload, not a synthetic
shortcut. The timed region is the express-style fused run: streaming device
binarization with host CC tracking consuming drained batches, then grouping,
segmentation (deletion events), and keyframe extraction. Median of RUNS
repeats.

Baseline: the reference's own per-frame torch pipeline (FCN_LectureNet
.binarize batch-1 on CPU, reference FCN_lecturenet.py:430-505) over >= 10
frames, measured once and cached in BASELINE_MEASURED.json. Only the
stage-01 forward is timed for the reference (its stages 02-05 only add more
time, so the reported speedup is a lower bound).
"""

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# persistent XLA compile cache: the production-model compile dominates cold
# bench runs (minutes through the remote-compile tunnel)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402  (after cache env)

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

BASELINE_FILE = os.path.join(REPO, "BASELINE_MEASURED.json")
LAST_GOOD_FILE = os.path.join(REPO, "BENCH_LAST_GOOD.json")

FRAMES = 128
WIDTH, HEIGHT = 960, 540
_DEFAULT_BATCH = "0"  # 0 = adaptive (pipeline.binarize.default_batch_size)
BATCH = int(os.environ.get("BENCH_BATCH", _DEFAULT_BATCH))
RUNS = 5
BASELINE_FRAMES = 10

# peak dense bf16 TFLOP/s per chip by device kind substring
PEAK_BF16 = (("v6", 918e12), ("v5p", 459e12), ("v5", 197e12),
             ("v4", 275e12), ("v3", 123e12), ("v2", 45e12))


def build_workload():
    import jax.numpy as jnp

    from lecturemath_tpu.models.fcn_lecturenet import FCNConfig, FCNLectureNet
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.utils.synthetic import (synthetic_rgb_lecture,
                                                 threshold_binarizer_variables)

    global BATCH
    net_config = FCNConfig()  # production widths 48..768
    model = FCNLectureNet(net_config, dtype=jnp.bfloat16)
    variables = threshold_binarizer_variables(net_config)
    if BATCH == 0:
        from lecturemath_tpu.pipeline.binarize import default_batch_size
        BATCH = default_batch_size(WIDTH, HEIGHT)
    binarizer = Binarizer(model, variables, batch_size=BATCH)

    rgb, clean, _, _ = synthetic_rgb_lecture(
        seed=0, n_frames=FRAMES, height=HEIGHT, width=WIDTH, n_boards=3,
        glyphs_per_board=40, glyph_size=(40, 60))
    return binarizer, rgb, clean


def run_pipeline(binarizer, rgb=None, source=None, width=None, height=None,
                 n_frames=None, min_keyframes=2, checkpoint_every=0):
    """One express-style fused run (stages 01-05). Returns (elapsed seconds,
    breakdown dict, results dict). ``source`` overrides the in-memory rgb
    array (streaming full-lecture-scale workloads render on demand);
    ``checkpoint_every`` records per-window tracker growth + RSS."""
    import numpy as np

    from lecturemath_tpu.data.space_time import SpaceTimeStruct
    from lecturemath_tpu.pipeline.device_worker import _vmrss_mb
    from lecturemath_tpu.pipeline import segmentation as seg
    from lecturemath_tpu.pipeline.cc_tracking import CCTracker
    from lecturemath_tpu.pipeline.keyframes import extract_keyframes
    from lecturemath_tpu.pipeline.video import ArraySource

    width = width or WIDTH
    height = height or HEIGHT
    n_frames = n_frames or FRAMES
    pc = time.perf_counter
    start = pc()

    # stages 01+02 fused: host tracking consumes drained batches while the
    # device crunches in-flight batches (pipeline/express.py shape).
    # NOTE: the tracker runs at the MODEL size only when no halving applies
    # (binary frames come back resized to full size) — exactly the express
    # pipeline contract.
    # slim mode (keep_frame_masks=False) mirrors the express pipeline —
    # per-frame mask crops are one (small) term of full-lecture RSS; the
    # dominant term is the tunnel's per-upload retention (PARITY.md
    # "Full-lecture RSS"), contained by LM_BENCH_WORKER_MB below
    tracker = CCTracker(width, height, 0.925, 0.925, 85,
                        keep_frame_masks=False)
    times, indices = [], []
    track_s = 0.0
    sample_binary = None
    checkpoints = []
    win_start = start
    if source is None:
        source = ArraySource(rgb, fps=1.0)
    for batch_times, batch_indices, frames in binarizer.stream_source(source):
        times.extend(batch_times)
        indices.extend(batch_indices)
        if sample_binary is None:
            sample_binary = frames[0]
        t0 = pc()
        for frame in frames:
            tracker.add_frame(frame)
        track_s += pc() - t0
        if checkpoint_every and \
                len(times) // checkpoint_every > len(checkpoints):
            now = pc()
            done = len(times)
            checkpoints.append({
                "frames": done,
                "window_fps": round(checkpoint_every /
                                    max(now - win_start, 1e-9), 2),
                "active_ccs": len(tracker._active),
                "unique_ccs": len(tracker.unique_ccs),
                # CURRENT VmRSS, not ru_maxrss: the lifetime peak can't
                # show containment (a recycling run and a leaking run that
                # peaked early would both read flat)
                "rss_mb": round(_vmrss_mb(), 1),
            })
            win_start = now
    stage12_s = pc() - start

    t0 = pc()
    tracker.split_stable_by_gaps(85, 3)
    stable = tracker.stable_cc_idxs(3)
    time_ov, _, all_ov = tracker.compute_overlapping_stable(stable, 5)
    groups, group_of = tracker.compute_groups(stable, time_ov, 0.5)
    ages, per_frame = tracker.compute_group_ages(groups)
    conflicts = tracker.compute_conflicts(stable, all_ov, len(groups), group_of)
    images, bounds = tracker.compute_group_images(groups, ages, 0.5)
    grouping_s = pc() - t0

    t0 = pc()
    intervals = seg.segments_from_deletion_events(
        ages, bounds, n_frames, float(width * height), 0.00005, 3, 0.0008)
    segmentation_s = pc() - t0

    t0 = pc()
    st3d = SpaceTimeStruct(times, indices, height, width, ages, images, bounds)
    keyframes, _ = extract_keyframes(st3d, intervals)
    keyframes_s = pc() - t0

    elapsed = pc() - start
    assert len(times) == n_frames and len(keyframes) >= min_keyframes
    breakdown = {
        "stage01_binarize_wall_s": round(stage12_s - track_s, 3),
        "stage02_track_host_s": round(track_s, 3),
        "stage03_grouping_s": round(grouping_s, 3),
        "stage04_segmentation_s": round(segmentation_s, 3),
        "stage05_keyframes_s": round(keyframes_s, 3),
    }
    results = {
        "raw_ccs": tracker.raw_cc_count(),
        "unique_ccs": len(tracker.unique_ccs),
        "stable_ccs": len(stable),
        "groups": len(groups),
        "keyframes": len(keyframes),
        "sample_binary": sample_binary,
    }
    if checkpoint_every:
        results["checkpoints"] = checkpoints
    return elapsed, breakdown, results


def logical_model_flops(cfg, height: int, width: int) -> float:
    """Analytic logical FLOPs of one plain-path forward at the padded model
    resolution (2 * MACs over every conv/deconv). The compiled graph's
    cost_analysis over-counts the s2d fast path (its phase-stacked kernels
    hold structural zeros), so MFU is computed against this instead."""
    h = -(-height // 32) * 32
    w = -(-width // 32) * 32
    flops = 0.0

    prev = cfg.in_channels
    for level, feat in enumerate(cfg.down_filters):
        hl, wl = h >> level, w >> level
        flops += 2.0 * cfg.kernel_size ** 2 * prev * feat * hl * wl
        prev = feat
    flops += 2.0 * cfg.kernel_size ** 2 * prev * cfg.mid_filters * (h >> 5) * (w >> 5)

    prev = cfg.mid_filters
    for level in range(5, 0, -1):
        hin, win = h >> level, w >> level
        up = cfg.upsample_filters[level - 1]
        out = cfg.up_filters[level - 1]
        skip = cfg.down_filters[level - 1]
        flops += 2.0 * 4 * prev * up * hin * win               # deconv 2x2 s2
        flops += 2.0 * cfg.kernel_size ** 2 * (up + skip) * out \
            * (h >> (level - 1)) * (w >> (level - 1))
        prev = out

    c, pk, k = cfg.in_channels, cfg.pixel_kernel_size, cfg.kernel_size
    p1, p2 = cfg.pixel_features
    flops += 2.0 * k ** 2 * prev * c * h * w                   # rec head
    flops += 2.0 * pk ** 2 * prev * 1 * h * w                  # text head
    flops += 2.0 * pk ** 2 * (c + prev) * p1 * h * w           # pixels_1
    flops += 2.0 * pk ** 2 * (c + p1) * p2 * h * w             # pixels_2
    flops += 2.0 * pk ** 2 * (c + p2) * 1 * h * w              # out
    return flops


def _fetch_barrier(array) -> float:
    """True device synchronization: fetch a reduced scalar.

    jax.block_until_ready is a NO-OP through the axon remote-device tunnel
    (measured: returns in 0.07 ms for a 1.1-TFLOP program) — only an actual
    value transfer proves the program ran. The device executes enqueued
    programs in order, so fetching a scalar derived from the LAST output
    synchronizes everything before it."""
    import jax.numpy as jnp

    return float(jax.device_get(jnp.sum(array, dtype=jnp.float32)))


def to_upload(binarizer, frames):
    """Convert RGB frames to the binarizer's upload format (host side)."""
    if getattr(binarizer, "upload_format", "rgb") == "yuv420":
        from lecturemath_tpu.models.fcn_lecturenet import rgb_to_yuv420_host

        return rgb_to_yuv420_host(frames)
    return frames


def measure_device_forward(binarizer, rgb, n_batches: int = 9):
    """Device-only packed forward fps on HBM-resident input.

    Timed as a marginal chain: (time of N batches + barrier) minus (time of
    1 batch + barrier), divided by N-1 — the scalar-fetch round trip
    (~40-100 ms through the tunnel) cancels out, leaving pure device
    execution (programs run in order on the core)."""
    import jax.numpy as jnp
    import numpy as np

    size = binarizer.batch_size
    frames = rgb[:size]
    if len(frames) < size:
        frames = np.concatenate([frames] * (-(-size // len(frames))))[:size]
    batch = jax.device_put(jnp.asarray(to_upload(binarizer, frames)))
    fn = binarizer._packed_fn

    def timed(n):
        start = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(batch)
        _fetch_barrier(out)
        return time.perf_counter() - start

    timed(1)  # warm / compiled
    t_one = min(timed(1) for _ in range(3))
    t_many = timed(n_batches)
    per_batch = max((t_many - t_one) / (n_batches - 1), 1e-9)
    return size / per_batch


def probe_link(binarizer, rgb):
    """Instantaneous tunnel state: (rtt_s, up_mbps, down_mbps).

    Upload: device_put of one RGB batch + scalar barrier; download: timed
    device_get of one packed output (the actual stage-01 return payload).
    Run before each timed e2e run so the JSON shows the link the run saw."""
    import jax.numpy as jnp
    import numpy as np

    pc = time.perf_counter
    resident = jax.device_put(jnp.zeros((), jnp.float32))
    float(jax.device_get(resident))  # settle
    start = pc()
    float(jax.device_get(resident))
    rtt_s = pc() - start

    batch = to_upload(binarizer, rgb[:binarizer.batch_size])
    start = pc()
    device_batch = jax.device_put(jnp.asarray(batch))
    _fetch_barrier(device_batch[:, ::16, ::16])  # cheap reduce, real sync
    up_s = max(pc() - start - rtt_s, 1e-9)

    packed = binarizer._packed_fn(device_batch)
    _fetch_barrier(packed)  # ensure computed before timing the transfer
    start = pc()
    host = np.asarray(jax.device_get(packed))
    down_s = max(pc() - start - rtt_s, 1e-9)

    return (rtt_s, batch.nbytes / up_s / 1e6, host.nbytes / down_s / 1e6)


def peak_bf16_flops():
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in PEAK_BF16:
        if key in kind:
            return peak, kind
    return None, kind


def measure_ours():
    import numpy as np

    binarizer, rgb, clean = build_workload()

    # warmup: compile the packed streaming forward (the only device
    # computation the pipeline uses), then one untimed full run so the
    # native-lib build / cv2 / tracking first-import costs don't pollute
    # the first timed run's breakdown
    import jax.numpy as jnp

    _fetch_barrier(binarizer._packed_fn(
        jnp.asarray(to_upload(binarizer, rgb[:BATCH]))))
    run_pipeline(binarizer, rgb)

    # device-only compute rate first: it feeds the per-run overlap model
    device_fps = measure_device_forward(binarizer, rgb)

    packed_bytes = FRAMES * HEIGHT * (-(-WIDTH // 8))
    runs = []
    accounting = []
    breakdown = results = None
    for _ in range(RUNS):
        # tunnel state this run saw: RTT + achieved up/down bandwidth
        rtt_s, up_mbps, down_mbps = probe_link(binarizer, rgb)
        elapsed, breakdown, results = run_pipeline(binarizer, rgb)
        runs.append(FRAMES / elapsed)

        # overlap model for the fused stage 01+02: with depth-2 pipelining
        # the wall should approach the SLOWEST lane, plus the pipeline-fill
        # latency of the first batch; the residual names what is unexplained
        track_s = breakdown["stage02_track_host_s"]
        bytes_per_px = 1.5 if binarizer.upload_format == "yuv420" else 3.0
        up_bytes = FRAMES * HEIGHT * WIDTH * bytes_per_px
        up_total = up_bytes / (up_mbps * 1e6)
        compute_total = FRAMES / device_fps
        down_total = packed_bytes / (down_mbps * 1e6)
        startup = (BATCH * HEIGHT * WIDTH * bytes_per_px) / (up_mbps * 1e6) \
            + BATCH / device_fps + rtt_s
        predicted = max(up_total, compute_total, down_total + track_s) \
            + startup
        wall_12 = breakdown["stage01_binarize_wall_s"] + track_s
        stream = getattr(binarizer, "stream_stats", {})
        accounting.append({
            "rtt_ms": round(rtt_s * 1e3, 1),
            "up_mbps": round(up_mbps, 1),
            # sustained lower bound implied by the run itself: a throttled
            # tunnel can burst at probe speed yet stream far slower, which
            # shows up as implied << probed (names the residual)
            "implied_up_mbps_min": round(
                up_bytes / max(wall_12, 1e-9) / 1e6, 1),
            "down_mbps": round(down_mbps, 1),
            "stream_phases_s": {k: round(v, 2) for k, v in stream.items()},
            "lanes_s": {"upload": round(up_total, 2),
                        "device_compute": round(compute_total, 2),
                        "download_plus_track": round(down_total + track_s,
                                                     2)},
            "pipeline_fill_s": round(startup, 2),
            "predicted_wall_s": round(predicted, 2),
            "stage0102_wall_s": round(wall_12, 2),
            "residual_s": round(wall_12 - predicted, 2),
            "_up_bytes": up_bytes, "_down_total": down_total,
            "_track_s": track_s, "_compute_total": compute_total,
            "_startup_nolink": BATCH / device_fps + rtt_s,
        })

    # bound the per-run predictor: the bandwidth probe is one batch on a
    # bursty tunnel, so a probe landing in a slow window can over-predict
    # the wall by ~8x (r03 run 1: predicted 32.3 vs measured 4.2). Re-predict
    # every run with the SESSION-BEST probed bandwidth — that prediction is a
    # hard lower bound on the wall; each run's truth lies between its own
    # prediction (probe-window link) and the bound (best-window link).
    best_up = max(a["up_mbps"] for a in accounting) * 1e6
    for entry in accounting:
        up_total_best = entry.pop("_up_bytes") / best_up
        bytes_fill = BATCH * HEIGHT * WIDTH * \
            (1.5 if binarizer.upload_format == "yuv420" else 3.0)
        lower = max(up_total_best, entry.pop("_compute_total"),
                    entry.pop("_down_total") + entry.pop("_track_s")) \
            + entry.pop("_startup_nolink") + bytes_fill / best_up
        entry["predicted_wall_best_link_s"] = round(lower, 2)
        slow_probe = entry["predicted_wall_s"] > 2 * entry["stage0102_wall_s"]
        if slow_probe:
            entry["predictor_note"] = (
                "bandwidth probe hit a slow tunnel window; the stream saw a "
                "faster link — see predicted_wall_best_link_s for the bound")

    # the threshold-head model must reproduce the clean synthetic binaries
    # (deterministic workload sanity: stage 02 consumed real model output)
    mismatch = float(np.mean(results.pop("sample_binary") != clean[0]))
    assert mismatch < 1e-4, f"model output diverged from oracle: {mismatch}"

    flops_per_frame = logical_model_flops(binarizer.model.config,
                                          HEIGHT, WIDTH)
    peak, device_kind = peak_bf16_flops()

    # capability number: device-only fps at the big-batch config a locally
    # attached chip would run (the e2e batch adapts to the transfer link)
    best_fps = device_fps
    best_batch = BATCH
    if BATCH < 96:
        from lecturemath_tpu.pipeline.binarize import Binarizer

        big = Binarizer(binarizer.model, binarizer.variables, batch_size=96,
                        fold_bn=False, s2d_heads=False)  # already rewritten
        best_fps = measure_device_forward(big, rgb)
        best_batch = 96
    mfu = None
    if peak:
        mfu = flops_per_frame * best_fps / peak

    n_params = sum(int(np.prod(np.shape(v))) for v in
                   jax.tree.leaves(binarizer.variables["params"]))

    extras = {
        "runs_fps": [round(r, 3) for r in runs],
        "stage01_device_fps": round(device_fps, 3),
        "device_fps_big_batch": {"batch": best_batch,
                                 "fps": round(best_fps, 3)},
        "model_flops_per_frame": flops_per_frame,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "device": device_kind,
        "batch_size": binarizer.batch_size,
        "params_millions": round(n_params / 1e6, 2),
        "frames": FRAMES,
        # end-to-end fps includes moving raw frames to the chip; on this
        # rig that link is a remote tunnel (~10-40 MB/s, variable), so the
        # e2e number is transfer-bound and noisy — per_run_accounting
        # records the link each run saw and the overlap model's residual
        "upload_format": binarizer.upload_format,
        "transfer_mb": {
            "frames_up": round(FRAMES * HEIGHT * WIDTH *
                               (1.5 if binarizer.upload_format == "yuv420"
                                else 3.0) / 1e6, 1),
            "packed_down": round(packed_bytes / 1e6, 1),
        },
        "per_run_accounting": accounting,
        "breakdown": breakdown,
        **{k: v for k, v in results.items()},
    }
    return statistics.median(runs), extras


def _production_binarizer(batch_size=None, **kwargs):
    import jax.numpy as jnp

    from lecturemath_tpu.models.fcn_lecturenet import FCNConfig, FCNLectureNet
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.utils.synthetic import threshold_binarizer_variables

    net_config = FCNConfig()  # production widths 48..768
    model = FCNLectureNet(net_config, dtype=jnp.bfloat16)
    variables = threshold_binarizer_variables(net_config)
    return Binarizer(model, variables, batch_size=batch_size, **kwargs)


def _worker_production_binarizer(recycle_mb: float):
    """WorkerBinarizer (pipeline/device_worker.py) over the production
    threshold-head model. The child rebuilds its Binarizer from a Config,
    so the synthetic threshold variables are materialized as a real
    msgpack checkpoint once and the production FCNConfig widths are
    spelled out as FCN_BINARIZER_NET_* keys."""
    from lecturemath_tpu.core.config import Config
    from lecturemath_tpu.models.fcn_lecturenet import FCNConfig
    from lecturemath_tpu.pipeline.binarize import save_checkpoint_variables
    from lecturemath_tpu.pipeline.device_worker import WorkerBinarizer
    from lecturemath_tpu.utils.synthetic import threshold_binarizer_variables

    net_config = FCNConfig()  # production widths 48..768
    ckpt = "/tmp/lm_bench_threshold_ckpt.msgpack"
    if not os.path.exists(ckpt):
        save_checkpoint_variables(threshold_binarizer_variables(net_config),
                                  ckpt)
    values = {
        "BINARIZATION_FCN_LECTURENET_DIR": os.path.dirname(ckpt),
        "BINARIZATION_FCN_LECTURENET_FILENAME": os.path.basename(ckpt),
        "FCN_BINARIZER_NET_MIDDLE_CONV_FILTERS_MIDDLE": net_config.mid_filters,
        "FCN_BINARIZER_NET_PIXEL_FEATURES_1": net_config.pixel_features[0],
        "FCN_BINARIZER_NET_PIXEL_FEATURES_2": net_config.pixel_features[1],
        "FCN_BINARIZER_NET_KERNEL_SIZE": net_config.kernel_size,
        "FCN_BINARIZER_NET_PIXEL_KERNEL_SIZE": net_config.pixel_kernel_size,
    }
    for i in range(1, 6):
        values[f"FCN_BINARIZER_NET_DOWN_CONV_FILTERS_{i}"] = \
            net_config.down_filters[i - 1]
        values[f"FCN_BINARIZER_NET_UPSAMPLE_FILTERS_{i}"] = \
            net_config.upsample_filters[i - 1]
        values[f"FCN_BINARIZER_NET_UP_CONV_FILTERS_{i}"] = \
            net_config.up_filters[i - 1]
    return WorkerBinarizer(Config(values), recycle_mb=recycle_mb)


def measure_long(n_frames=3600):
    """Full-lecture-scale soak (VERDICT r4 #1): a realistic AccessMath-scale
    lecture — n_frames samples (1 h @ 1 FPS), 1,200 unique CCs over 10
    boards/9 erase cycles, 1920x1080 source — streamed through the fused
    express pipeline on the device. Frames render on demand (a materialized
    1080p lecture would be >20 GB).

    Three runs, one pass each:
      * ``128f_reference``: the standard 128-frame 960x540 headline workload
        (same session/link — the comparability anchor)
      * ``long_540p``: n_frames at 960x540 ingest — per-frame work identical
        to the anchor, isolating SCALE effects (tracker growth, RSS, stage-03
        cost at 1,200 stable CCs); the VERDICT 'within ~20%' check is this
        run vs the anchor
      * ``long_1080p``: n_frames at full 1920x1080 — the TRUE reference
        regime: 2.07 MP is BELOW the 2.5 MP halving cap
        (FCN_lecturenet.py:434-437), so the reference runs the net unhalved
        at 1080p; fps is ~4x lower per frame by pixel count
    """
    import jax.numpy as jnp
    import numpy as np

    from lecturemath_tpu.utils.synthetic import SyntheticRGBLectureSource

    results = {}

    # anchor: the standard headline workload, one run
    binarizer, rgb, clean = build_workload()
    _fetch_barrier(binarizer._packed_fn(
        jnp.asarray(to_upload(binarizer, rgb[:BATCH]))))
    run_pipeline(binarizer, rgb)  # untimed warm pass
    rtt_s, up_mbps, down_mbps = probe_link(binarizer, rgb)
    elapsed, breakdown, res = run_pipeline(binarizer, rgb)
    res.pop("sample_binary")
    results["128f_reference"] = {
        "frames": FRAMES, "fps": round(FRAMES / elapsed, 2),
        "wall_s": round(elapsed, 1), "breakdown": breakdown,
        "link": {"rtt_ms": round(rtt_s * 1e3, 1),
                 "up_mbps": round(up_mbps, 1),
                 "down_mbps": round(down_mbps, 1)}, **res}

    # LM_BENCH_WORKER_MB > 0: run the long lanes' device path through the
    # recycled child process (pipeline/device_worker.py) — demonstrates the
    # tunnel-leak containment at soak scale: the run_pipeline RSS
    # checkpoints then track the PARENT, which no longer accumulates the
    # per-upload retention (PARITY.md "Full-lecture RSS")
    worker_mb = float(os.environ.get("LM_BENCH_WORKER_MB", "0"))
    # LM_BENCH_LONG_LANES=540p|1080p|both (default both): one lane per
    # invocation lets the soak fit inside a backend-UP window when the
    # remote backend is flapping (observed multi-hour outages; each lane
    # ships GBs through the tunnel) — results from separate runs are
    # stitched into the round artifact by hand
    lanes = os.environ.get("LM_BENCH_LONG_LANES", "both")
    for label, (w, h, glyph) in (("long_540p", (960, 540, (20, 30))),
                                 ("long_1080p", (1920, 1080, (40, 60)))):
        if lanes != "both" and not label.endswith(lanes):
            continue
        source = SyntheticRGBLectureSource(
            seed=0, n_frames=n_frames, height=h, width=w, n_boards=10,
            glyphs_per_board=120, glyph_size=glyph)
        from lecturemath_tpu.pipeline.binarize import default_batch_size

        batch = default_batch_size(w, h)
        warm = np.stack([source.rgb_frame(0)] * batch)
        if worker_mb > 0:
            lane = _worker_production_binarizer(worker_mb)
            # warm the CHILD's compile at the stream's shapes (one
            # batch-sized throwaway stream); link probe rides the anchor
            # binarizer — the worker exposes no in-process packed fn
            list(lane.stream_source(SyntheticRGBLectureSource(
                seed=1, n_frames=batch, height=h, width=w, n_boards=1,
                glyphs_per_board=4, glyph_size=glyph)))
            rtt_s, up_mbps, down_mbps = probe_link(binarizer, rgb)
        else:
            lane = _production_binarizer()
            # compile + settle outside the timed run (no halving at either
            # size: both are <= the 2.5MP cap, so the model input IS the
            # source size and this warm batch matches the stream's shapes)
            _fetch_barrier(lane._packed_fn(jnp.asarray(to_upload(lane,
                                                                 warm))))
            rtt_s, up_mbps, down_mbps = probe_link(lane, warm)
        elapsed, breakdown, res = run_pipeline(
            lane, source=source, width=w, height=h, n_frames=n_frames,
            min_keyframes=8, checkpoint_every=512)
        sample = res.pop("sample_binary")
        # workload sanity: the threshold-head model reproduced frame 0's ink
        gt = source.binary_frame(0)
        mismatch = float(np.mean((sample > 0) != (gt > 0)))
        assert mismatch < 0.02, f"{label}: model output diverged {mismatch}"
        results[label] = {
            "frames": n_frames, "resolution": f"{w}x{h}",
            "fps": round(n_frames / elapsed, 2),
            "wall_s": round(elapsed, 1), "breakdown": breakdown,
            "stream_phases_s": {k: round(v, 2)
                                for k, v in lane.stream_stats.items()},
            "gt_pixel_mismatch": round(mismatch, 5),
            "link": {"rtt_ms": round(rtt_s * 1e3, 1),
                     "up_mbps": round(up_mbps, 1),
                     "down_mbps": round(down_mbps, 1)}, **res}
        if worker_mb > 0:
            results[label]["worker"] = {"recycle_mb": worker_mb,
                                        "recycles": lane.recycles}
            lane.close()

    anchor = results["128f_reference"]["fps"]
    # under a lane filter the 540p run may be absent; headline on whatever ran
    at_scale = results.get("long_540p", results.get("long_1080p", {})).get(
        "fps", anchor)
    return {
        "metric": f"full-lecture soak fps ({n_frames} frames, 10 boards, "
                  f"1,200 unique CCs)",
        "value": at_scale,
        "unit": "frames/sec",
        "vs_baseline": None,
        "fps_scale_ratio_540p": (round(at_scale / anchor, 3)
                                 if "long_540p" in results else None),
        "note": "fps_scale_ratio_540p compares the 3,600-frame 960x540 run "
                "to the same-session 128-frame headline workload (same "
                "per-frame work; ratio <1 names pure scale cost). The "
                "1080p run is the true reference regime — 2.07MP is below "
                "the 2.5MP halving cap so the net runs at full resolution.",
        "runs": results,
        "device": jax.devices()[0].device_kind,
    }


def measure_1080p(n_frames=96):
    """Downscale-placement A/B (VERDICT r4 #2). Two workloads:

    * 1920x1080 (the real lecture shape): 2.07 MP < the 2.5 MP cap — NO
      halving anywhere (reference parity is full-res); measured as-is.
    * 2560x1440 (3.7 MP, > cap): the halving path actually runs; A/B of
      WHERE — host 'lanczos' (reference-parity filter), host 'area'
      (fast box filter) or 'device' (full-res upload, on-chip box
      halving). On this rig the link is the bottleneck so host placement
      should win; on a locally attached chip the trade reverses.
    """
    import numpy as np

    from lecturemath_tpu.pipeline.binarize import (default_batch_size,
                                                   resolve_model_size)
    from lecturemath_tpu.utils.synthetic import SyntheticRGBLectureSource

    entries = {}
    configs = [("1080p_full_res", 1920, 1080, {}),
               ("1440p_host_lanczos", 2560, 1440, {}),
               ("1440p_host_area", 2560, 1440, {"downscale_filter": "area"}),
               ("1440p_device", 2560, 1440, {"downscale": "device"})]
    for label, w, h, kwargs in configs:
        source = SyntheticRGBLectureSource(
            seed=0, n_frames=n_frames, height=h, width=w, n_boards=3,
            glyphs_per_board=60, glyph_size=(40, 60))
        lane = _production_binarizer(**kwargs)
        batch = default_batch_size(*resolve_model_size(w, h))
        warm = np.stack([source.rgb_frame(0)] * batch)
        # warm pass compiles whichever packed fn the stream will build
        # (device placement rebuilds with pre_halvings on batch 1)
        list(lane.stream_source(SyntheticRGBLectureSource(
            seed=1, n_frames=batch, height=h, width=w, n_boards=1,
            glyphs_per_board=4, glyph_size=(40, 60))))
        # the link probe must dispatch the COMPILED packed fn: host
        # placements feed it model-size frames, device placement full-res
        mw, mh = resolve_model_size(w, h)
        if lane.downscale == "device" or (mw, mh) == (w, h):
            probe_frames = warm[:lane.batch_size]
        else:
            import cv2

            probe_frames = np.stack([cv2.resize(f, (mw, mh))
                                     for f in warm[:lane.batch_size]])
        rtt_s, up_mbps, down_mbps = probe_link(lane, probe_frames)
        elapsed, breakdown, res = run_pipeline(
            lane, source=source, width=w, height=h, n_frames=n_frames,
            min_keyframes=2)
        res.pop("sample_binary")
        entries[label] = {
            "resolution": f"{w}x{h}", "frames": n_frames,
            "fps": round(n_frames / elapsed, 2),
            "wall_s": round(elapsed, 1),
            "downscale_host_s": lane.stream_stats.get("downscale_s", 0.0)
            and round(lane.stream_stats["downscale_s"], 2),
            "stream_phases_s": {k: round(v, 2)
                                for k, v in lane.stream_stats.items()},
            "breakdown": breakdown,
            "link": {"rtt_ms": round(rtt_s * 1e3, 1),
                     "up_mbps": round(up_mbps, 1),
                     "down_mbps": round(down_mbps, 1)}, **res}

    ab = {k: v["fps"] for k, v in entries.items()}
    best_1440 = max((k for k in ab if k.startswith("1440")), key=ab.get)
    return {
        "metric": "1080p/1440p ingest fps + downscale placement A/B",
        "value": entries["1080p_full_res"]["fps"],
        "unit": "frames/sec",
        "vs_baseline": None,
        "best_1440p_placement": best_1440,
        "chosen_default": "host/lanczos (reference parity; also fastest "
                          "behind a bandwidth-bound link unless measured "
                          "otherwise)",
        "entries": entries,
        "device": jax.devices()[0].device_kind,
    }


def measure_reference_baseline(max_frames=BASELINE_FRAMES):
    """Per-frame seconds of the reference stage-01 path (torch, CPU,
    batch 1), run from /root/reference via the oracle setup."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle import ensure_oracle, stub_torchvision
    ensure_oracle()
    stub_torchvision()

    from PIL import Image

    from AM_CommonTools.configuration.configuration import Configuration
    from AccessMath.lecturenet_v1.FCN_lecturenet import FCN_LectureNet

    config = Configuration.from_file(
        "/root/reference/ACCESS2021_release/configs/FCN_LectureNet.conf")
    net = FCN_LectureNet.CreateFromConfig(config, 3, False)
    net.eval()

    sys.path.insert(0, REPO)
    from lecturemath_tpu.utils.synthetic import synthetic_rgb_lecture

    rgb, _, _, _ = synthetic_rgb_lecture(seed=0, n_frames=max_frames + 1,
                                         height=HEIGHT, width=WIDTH,
                                         n_boards=1, glyphs_per_board=8,
                                         glyph_size=(40, 60))
    # warmup frame (allocators, thread pools)
    net.binarize(Image.fromarray(rgb[0]), force_binary=True)

    start = time.perf_counter()
    for t in range(1, max_frames + 1):
        net.binarize(Image.fromarray(rgb[t]), force_binary=True)
    per_frame = (time.perf_counter() - start) / max_frames
    return 1.0 / per_frame  # fps


def measure_reference_stages_2_to_5(n_frames: int = 32):
    """Per-frame seconds of the reference's stages 02-05 (CC tracking,
    grouping, segmentation, keyframes) on clean synthetic binary frames —
    completes the full-pipeline reference baseline (stage 01 is measured
    separately; the two per-frame costs add)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle import ensure_oracle
    ensure_oracle()
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from AccessMath.preprocessing.content.cc_stability_estimator import \
        CCStabilityEstimator

    sys.path.insert(0, REPO)
    from lecturemath_tpu.utils.synthetic import synthetic_lecture

    frames, _, _ = synthetic_lecture(
        seed=0, n_frames=n_frames, height=HEIGHT, width=WIDTH, n_boards=3,
        glyphs_per_board=40, glyph_size=(40, 60))

    start = time.perf_counter()
    estimator = CCStabilityEstimator(WIDTH, HEIGHT, 0.925, 0.925, 85)
    for frame in frames:
        estimator.add_frame(frame, True)
    estimator.finish_processing()
    estimator.rebuilt_binary_images()
    estimator.split_stable_cc_by_gaps(85, 3)
    stable = estimator.get_stable_cc_idxs(3)
    time_ov, _, all_ov = estimator.compute_overlapping_stable_cc(stable, 5)
    groups, group_of = estimator.compute_groups(stable, time_ov, 0.5,
                                                0.5, 0.25)
    ages, per_frame = estimator.compute_groups_temporal_information(groups)
    estimator.compute_conflicting_groups(stable, all_ov, len(groups),
                                         group_of)
    images, bounds = estimator.compute_group_images(groups, ages, 0.5)
    estimator.frames_from_groups(groups, bounds, per_frame, ages, images,
                                 None, 3, True)
    per_frame_s = (time.perf_counter() - start) / n_frames
    return 1.0 / per_frame_s  # fps


def get_baseline_fps():
    cached = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            cached = json.load(f)
    if cached.get("baseline_frames", 0) >= BASELINE_FRAMES and \
            "reference_full_fps" in cached:
        return cached["reference_fps"], cached["reference_full_fps"]
    stage01_fps = cached.get("reference_fps")
    if not stage01_fps or cached.get("baseline_frames", 0) < BASELINE_FRAMES:
        stage01_fps = measure_reference_baseline()
    rest_fps = measure_reference_stages_2_to_5()
    # per-frame times add: full-pipeline fps = harmonic combination
    full_fps = 1.0 / (1.0 / stage01_fps + 1.0 / rest_fps)
    with open(BASELINE_FILE, "w") as f:
        json.dump({"reference_fps": stage01_fps,
                   "reference_stages_2_to_5_fps": rest_fps,
                   "reference_full_fps": full_fps,
                   "baseline_frames": BASELINE_FRAMES,
                   "workload": f"{WIDTH}x{HEIGHT} synthetic; stage-01 torch "
                               f"CPU batch-1 + stages 02-05 via the "
                               f"reference CCStabilityEstimator/segmenter "
                               f"on the same glyph density"}, f, indent=1)
    return stage01_fps, full_fps


def measure_training(crop: int = 256, batch_sizes=(8, 16, 32, 48, 64),
                     steps: int = 10):
    """Training throughput at production widths (VERDICT r2 item 5): per
    batch size, median step time after compile, images/sec, training MFU
    (3x forward FLOPs: fwd + ~2x bwd), and the HBM high-water mark. The
    reference trains batch 8 at 256x256 crops and documents only an OOM
    envelope (lecturenet_train_02_train_binarizer.py:130-134); this gives
    the capability an actual number. The first failure in a dtype ends
    that dtype's sweep (larger batches only OOM harder); a non-finite
    loss raises."""
    import numpy as np

    import jax.numpy as jnp

    from lecturemath_tpu.models.fcn_lecturenet import FCNConfig, FCNLectureNet
    from lecturemath_tpu.train.trainer import Trainer

    net_config = FCNConfig()  # production widths, as the train CLIs run
    fwd_flops = logical_model_flops(net_config, crop, crop)
    peak, device_kind = peak_bf16_flops()
    device = jax.devices()[0]
    rng = np.random.default_rng(0)

    per_batch = []
    sweep = [(b, "float32", None) for b in batch_sizes]
    # bf16 compute (fp32 params) — the TPU-native mixed-precision mode
    sweep += [(b, "bfloat16", None) for b in (batch_sizes[0], batch_sizes[-1])]
    # bf16 x fast-path combos: plain bf16 LOSES to fp32 (the fp32 BN
    # casts re-layout every full-res activation); the s2d / BN-folded
    # graphs remove those casts, so bf16 gets to run the MXU at rate
    sweep += [(b, "bfloat16", v) for b in (batch_sizes[0], batch_sizes[-1])
              for v in ("train_s2d", "frozen_fold_s2d")]
    # bn_dtype=bf16 (VERDICT r4 item 4): BN statistics + normalization in
    # bf16 (running buffers fp32) — removes the fp32 BN casts that make
    # plain-layout bf16 lose to fp32, and keeps saved-for-backward BN
    # activations bf16 in the s2d layout
    sweep += [(b, "bfloat16", v) for b in (batch_sizes[0], batch_sizes[-1])
              for v in ("bn_bf16", "train_s2d_bn_bf16")]
    # frozen-BN (warm-start) phase variants: plain eval-mode BN, traced BN
    # folding, and folding + s2d-domain head convs (VERDICT r3 item 5 —
    # both levers measured, integrate-or-retire)
    for b in (batch_sizes[0], 32, batch_sizes[-1]):
        for variant in ("frozen", "frozen_fold", "frozen_fold_s2d"):
            sweep.append((b, "float32", variant))
    # train-mode BN s2d path (PhaseBatchNorm) — the from-scratch lever
    for b in (batch_sizes[0], 32, batch_sizes[-1]):
        sweep.append((b, "float32", "train_s2d"))
    # LM_BENCH_TRAIN_SWEEP="64:bfloat16:train_s2d_bn_bf16,8:float32:" runs
    # only the named (batch:dtype:variant) entries — for A/B'ing one lever
    # without paying the full sweep's compile wall (empty variant = None)
    override = os.environ.get("LM_BENCH_TRAIN_SWEEP")
    if override:
        sweep = []
        for item in override.split(","):
            b, dt, var = item.strip().split(":")
            sweep.append((int(b), dt, var or None))
    failed_keys = set()
    for batch, dtype, variant in sweep:
        # larger batches can only OOM harder WITHIN one (dtype, variant)
        # sweep; a plain-fp32 OOM must not skip the lighter variant entries
        if (dtype, variant) in failed_keys:
            continue
        model = FCNLectureNet(
            net_config,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
            s2d_train=(variant is not None
                       and variant.startswith("train_s2d")),
            bn_dtype=jnp.bfloat16 if (variant is not None
                                      and variant.endswith("bn_bf16"))
            else jnp.float32)
        trainer_kwargs = {}
        if variant is not None and variant.startswith("frozen"):
            trainer_kwargs = {
                "freeze_bn": True,
                "fold_frozen_bn": "fold" in variant,
                "s2d_heads": variant.endswith("s2d"),
            }
        trainer = Trainer(model, learning_rate=1e-3, phase="binarizer",
                          **trainer_kwargs)
        try:
            state = trainer.init_state(jax.random.PRNGKey(0),
                                       (1, crop, crop, 3))
            data = {
                "image": jnp.asarray(rng.normal(
                    0, 1, (batch, crop, crop, 3)), jnp.float32),
                "target": jnp.asarray(
                    rng.random((batch, crop, crop, 1)) > 0.5, jnp.float32),
                "text_mask": jnp.asarray(
                    rng.random((batch, crop, crop, 1)) > 0.5, jnp.float32),
            }
            # compile + settle; synchronize by FETCHING the loss value
            # (block_until_ready is a no-op through the tunnel — see
            # _fetch_barrier); marginal-chain timing cancels the fetch RTT
            def timed(n, state):
                start = time.perf_counter()
                metrics = None
                for _ in range(n):
                    state, metrics = trainer.step(state, data)
                total = float(jax.device_get(metrics["total"]))
                assert np.isfinite(total), f"non-finite loss: {total}"
                return time.perf_counter() - start, state

            _, state = timed(1, state)  # compile
            t_a, state = timed(1, state)
            t_b, state = timed(1, state)
            t_one = min(t_a, t_b)
            t_many, state = timed(steps + 1, state)
            step_s = max((t_many - t_one) / steps, 1e-9)

            stats = device.memory_stats() or {}
            entry = {
                "batch": batch,
                "dtype": dtype,
                "bn": variant or "train",
                "step_ms": round(step_s * 1e3, 1),
                "images_per_sec": round(batch / step_s, 1),
                "train_mfu": round(3.0 * fwd_flops * batch / step_s / peak, 4)
                if peak else None,
                "hbm_peak_gb": round(stats["peak_bytes_in_use"] / 2**30, 2)
                if "peak_bytes_in_use" in stats else None,
            }
            per_batch.append(entry)
            del state, data
        except AssertionError:   # non-finite loss is a real failure
            raise
        except Exception as err:  # noqa: BLE001 — OOM ends this dtype
            per_batch.append({"batch": batch, "dtype": dtype,
                              "bn": variant or "train",
                              "error": type(err).__name__})
            failed_keys.add((dtype, variant))

    # headline matches the metric label (fp32 train-mode BN — training from
    # scratch, what the train CLIs run cold; train_s2d is their default
    # path); the warm-start frozen-BN fast path is reported separately
    ok = [e for e in per_batch
          if "error" not in e and e["dtype"] == "float32"
          and e["bn"] in ("train", "train_s2d")]
    best = max(ok, key=lambda e: e["images_per_sec"]) if ok else None
    frozen = [e for e in per_batch if "error" not in e
              and e["bn"].startswith("frozen")]
    warm_best = max(frozen, key=lambda e: e["images_per_sec"]) \
        if frozen else None
    return {
        "metric": f"train images/sec (binarizer phase, {crop}x{crop}, "
                  f"production widths, fp32)",
        "value": best["images_per_sec"] if best else 0.0,
        "unit": "images/sec",
        "vs_baseline": None,  # the reference publishes no training number
        "warm_start_best": warm_best,  # frozen-BN fold+s2d fast path
        "device": device_kind,
        "model_fwd_flops_per_image": fwd_flops,
        "per_batch": per_batch,
        "reference_note": "reference trains batch 8 @ 256x256, single GPU, "
                          "no published throughput "
                          "(lecturenet_train_02:130-134,157)",
    }


def measure_serving(width: int = 960, height: int = 540,
                    concurrency=(1, 8), requests_per_level: int = 24,
                    max_batch: int = 8, window_ms: float = 5.0):
    """Serving-surface bench: a resident BinarizeService at the production
    bucket with the production-width threshold-head model; per-request
    latency and aggregate throughput at several client concurrency levels
    (micro-batching aggregates concurrent callers into one dispatch).

    Latency includes the full request contract — host resize, device
    forward, and the binary download back to the caller — so behind the
    remote tunnel it is dominated by moving the (unpacked) binary down
    the link, exactly what a remote caller would experience."""
    import threading

    import numpy as np

    import jax.numpy as jnp

    from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig,
                                                       FCNLectureNet)
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.pipeline.server import BinarizeService
    from lecturemath_tpu.utils.synthetic import (synthetic_lecture,
                                                 threshold_binarizer_variables)

    net_config = FCNConfig()   # production widths
    model = FCNLectureNet(net_config)
    binarizer = Binarizer(model, threshold_binarizer_variables(net_config),
                          upload_format="auto")   # yuv420 behind the tunnel
    service = BinarizeService(binarizer, model_size=(width, height),
                              max_batch=max_batch, batch_window_ms=window_ms)
    frames, _, _ = synthetic_lecture(seed=3, n_frames=2, height=height,
                                     width=width, n_boards=3,
                                     glyphs_per_board=40)
    frame = np.stack([frames[0]] * 3, axis=-1) if frames[0].ndim == 2 \
        else frames[0]

    levels = []
    for level in concurrency:
        n_total = requests_per_level
        latencies = []
        lock = threading.Lock()
        before = service.stats()

        def client(n):
            for _ in range(n):
                start = time.perf_counter()
                binary = service.binarize_rgb(frame)
                elapsed = time.perf_counter() - start
                assert binary.shape == (height, width)
                with lock:
                    latencies.append(elapsed)

        per_client = max(1, n_total // level)
        threads = [threading.Thread(target=client, args=(per_client,))
                   for _ in range(level)]
        wall = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - wall
        after = service.stats()
        done = len(latencies)
        latencies.sort()
        levels.append({
            "concurrency": level,
            "requests": done,
            "requests_per_sec": round(done / wall, 2),
            "latency_p50_ms": round(latencies[done // 2] * 1e3, 1),
            "latency_p95_ms": round(latencies[int(done * 0.95)] * 1e3, 1),
            "dispatches": after["batches"] - before["batches"],
            "mean_batch": round(done / max(1, after["batches"]
                                           - before["batches"]), 2),
        })
    service.close()
    best = max(levels, key=lambda entry: entry["requests_per_sec"])
    return {
        "metric": f"serving requests/sec ({width}x{height}, production "
                  f"widths, micro-batched)",
        "value": best["requests_per_sec"],
        "unit": "requests/sec",
        "vs_baseline": None,   # the reference has no serving surface
        "levels": levels,
        "device": jax.devices()[0].device_kind,
        "note": "latency includes the unpacked-binary download to the "
                "caller (tunnel-bound on this rig)",
    }


def _subprocess_probe(timeout_s):
    """Probe the device backend from a FRESH interpreter.

    A hung in-process backend init cannot be retried (jax caches the
    half-initialized backend behind a lock, so every later call in this
    process joins the same hang) — each retry must pay a clean
    interpreter. Returns (ok, error_string_or_None).
    """
    import subprocess

    code = ("import jax, jax.numpy as jnp; "
            "jax.device_get(jnp.zeros(()) + 1.0); print('LM_PROBE_OK')")
    try:
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, env=os.environ.copy())
    except subprocess.TimeoutExpired:
        return False, (f"device probe subprocess timed out after "
                       f"{timeout_s:.0f} s (backend hang)")
    if "LM_PROBE_OK" in (res.stdout or ""):
        return True, None
    tail = ((res.stderr or "") + (res.stdout or "")).strip().splitlines()
    detail = tail[-1] if tail else f"probe exited {res.returncode}"
    return False, f"device backend unavailable: {detail}"


def _wait_for_backend():
    """Probe the backend with bounded retries. Returns None when up,
    else the last error string.

    The axon backend has been observed to RAISE (Unavailable) and to
    HANG for hours; a single probe at an unlucky moment would turn the
    whole round artifact into an error record, so spend up to
    LM_BENCH_PROBE_DEADLINE_S (default 600 s) re-probing from fresh
    subprocesses before degrading.
    """
    deadline_s = float(os.environ.get("LM_BENCH_PROBE_DEADLINE_S", "600"))
    # per-attempt budget: a HEALTHY probe pays a fresh jax import + backend
    # init + one compile through the remote-compile tunnel — 120 s default
    # (the amount the cpu-path tests need on this 1-core VM), configurable
    # for slower sessions so slowness is not misread as an outage
    probe_timeout = min(
        float(os.environ.get("LM_BENCH_PROBE_TIMEOUT_S", "120")), deadline_s)
    start = time.time()
    ok, err = _subprocess_probe(probe_timeout)
    while not ok:
        remaining = deadline_s - (time.time() - start)
        if remaining < probe_timeout + 5.0:
            break
        time.sleep(30.0)
        ok, err = _subprocess_probe(probe_timeout)
    return None if ok else err


def _load_last_good():
    """Most recent good headline: the untracked history file when present,
    else the newest committed round snapshot (fresh checkouts have no
    history file — a degraded headline must still carry real numbers, and
    _update_last_good must still seed best_known from prior rounds)."""
    import glob as _glob

    snaps = sorted(_glob.glob(os.path.join(
        os.path.dirname(LAST_GOOD_FILE), "BENCH_LAST_GOOD_r*_snapshot.json")))
    for path in [LAST_GOOD_FILE] + snaps[::-1]:
        try:
            with open(path) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            continue
    return None


def _update_last_good(headline):
    """Remember this run so a later outage still reports real numbers.

    e2e fps swings ~10x with tunnel weather (median 4.5..34.4 observed
    across sessions), so also carry forward the BEST median ever recorded
    (with its own provenance) — a degraded round artifact then shows both
    "most recent good" and the weather-independent ceiling.

    BENCH_LAST_GOOD.json is deliberately UNTRACKED (.gitignore): the
    driver runs bench after the round's last commit, and a tracked
    history file would leave the tree dirty every round (VERDICT r4
    weak #6). Rounds commit point-in-time snapshots
    (BENCH_LAST_GOOD_r*_snapshot.json) instead."""
    record = dict(headline, recorded_unix=round(time.time(), 1))
    # nothing in here may abort the run: this is called AFTER a successful
    # measurement and BEFORE the certifying headline print — a malformed
    # prior file (foreign writer, hand edits) must cost only the history
    try:
        prev = _load_last_good() or {}
        best_keys = ("median_e2e_fps", "runs_fps", "stage01_device_fps",
                     "mfu", "vs_baseline", "recorded_unix",
                     "link_provenance")

        def _median(c):
            try:
                return float(c["median_e2e_fps"])
            except (KeyError, TypeError, ValueError):
                return None

        candidates = [c for c in (prev.get("best_known"), prev, record)
                      if isinstance(c, dict) and _median(c) is not None]
        best = max(candidates, key=_median)
        record["best_known"] = {k: best.get(k) for k in best_keys}
        # atomic replace: the file now carries irreplaceable history
        # (best_known), so a mid-write kill must not truncate it
        tmp = LAST_GOOD_FILE + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(record, fh, indent=1)
        os.replace(tmp, LAST_GOOD_FILE)
        return record
    except Exception:  # noqa: BLE001 — history is best-effort
        return None


def _degraded_exit(error, note):
    """Emit the parseable degraded headline and hard-exit (a hung backend
    thread would otherwise keep the interpreter alive). stdout must be
    flushed explicitly: the driver pipes stdout (block-buffered), and
    os._exit skips the atexit/stdio flush."""
    print(json.dumps({
        "metric": "frames/sec/chip (binarize->CC->summary, 960x540)",
        "value": None, "unit": "frames/sec", "vs_baseline": None,
        "error": error,
        "last_good": _load_last_good(),
        "note": note,
    }))
    sys.stdout.flush()
    os._exit(0)


def _arm_watchdog():
    """Third belt: the backend can die MID-measurement — device_get then
    hangs forever and the bench would produce no output at all. A daemon
    timer emits the degraded headline and exits if the whole run exceeds
    LM_BENCH_WALL_DEADLINE_S (default 2400 s — cold tunnel compiles run
    minutes, measured runs seconds). Cancel() it once measurements are
    done."""
    import threading

    deadline_s = float(os.environ.get("LM_BENCH_WALL_DEADLINE_S", "2400"))
    timer = threading.Timer(
        deadline_s, _degraded_exit,
        args=(f"bench exceeded the {deadline_s:.0f}s wall deadline "
              f"(backend died mid-run?)",
              "measurements hung after a healthy init probe; last_good "
              "is the most recent successful headline"))
    timer.daemon = True
    timer.start()
    return timer


def main():
    # fail as data, not as a traceback: the driver records only the
    # stdout tail, so a down tunnel/backend must still yield a parseable
    # headline line — with the last successful run's numbers attached so
    # the artifact stays quantitative even through an outage.
    err = _wait_for_backend()
    if err is not None:
        _degraded_exit(err, "device backend unreachable for the whole "
                            "probe window; last_good is the most recent "
                            "successful headline (see also ROUND4.md / "
                            "BENCH_TRAIN.json)")
    # second belt: the backend can die between the subprocess probe and
    # this process's own init — guard the in-process init with a deadline
    # so a hang still yields a parseable line.
    from lecturemath_tpu.core.backend_probe import call_with_deadline

    def _init():
        jax.devices()
        jax.device_get(jax.numpy.zeros(()) + 1.0)

    try:
        call_with_deadline(_init, 300.0, "in-process backend init")
    except Exception as e:  # noqa: BLE001
        _degraded_exit(f"device backend unavailable: {e}",
                       "backend answered the subprocess probe but the "
                       "in-process init failed/hung; last_good is the "
                       "most recent successful headline")
    if "--long" in sys.argv:
        # the soak ships ~14 GB through the tunnel; a slow link window can
        # legitimately take >2400 s
        os.environ.setdefault("LM_BENCH_WALL_DEADLINE_S", "7200")
    watchdog = _arm_watchdog()
    if "--train" in sys.argv:
        result = measure_training()
        watchdog.cancel()
        print(json.dumps(result))
        return
    if "--long" in sys.argv:
        # LM_BENCH_LONG_FRAMES: shrink the soak so one lane fits inside a
        # short backend-UP window (flapping-backend regime); the recycle /
        # containment mechanics are fully exercised from ~1,500 frames
        result = measure_long(
            n_frames=int(os.environ.get("LM_BENCH_LONG_FRAMES", "3600")))
        watchdog.cancel()
        print(json.dumps(result))
        return
    if "--1080p" in sys.argv:
        result = measure_1080p()
        watchdog.cancel()
        print(json.dumps(result))
        return
    if "--serve" in sys.argv:
        result = measure_serving()
        watchdog.cancel()
        print(json.dumps(result))
        return
    stage01_fps, full_fps = get_baseline_fps()
    ours_fps, extras = measure_ours()
    watchdog.cancel()
    detail = {
        "metric": "frames/sec/chip (binarize->CC->summary, 960x540)",
        "value": round(ours_fps, 3),
        "unit": "frames/sec",
        # conservative headline: reference stage-01 forward only; the
        # honest like-for-like (its full 5-stage pipeline) is larger
        "vs_baseline": round(ours_fps / stage01_fps, 1),
        "vs_baseline_full_pipeline": round(ours_fps / full_fps, 1),
        "baseline_fps": round(stage01_fps, 4),
        "baseline_full_fps": round(full_fps, 4),
        **extras,
    }
    print(json.dumps(detail))
    # compact headline LAST: the driver keeps only the output tail, and the
    # long detail line above once truncated the round artifact's head
    # (VERDICT r3 weak #4) — this line alone certifies the run
    links = extras.get("per_run_accounting", [])
    headline = {
        "metric": detail["metric"],
        "value": detail["value"],
        "unit": "frames/sec",
        "vs_baseline": detail["vs_baseline"],
        "vs_baseline_full_pipeline": detail["vs_baseline_full_pipeline"],
        "median_e2e_fps": detail["value"],
        "runs_fps": extras["runs_fps"],
        "stage01_device_fps": extras["stage01_device_fps"],
        "mfu": extras["mfu"],
        "device": extras["device"],
        "link_provenance": {
            "up_mbps": [a["up_mbps"] for a in links],
            "down_mbps": [a["down_mbps"] for a in links],
            "note": "e2e fps is tunnel-transfer-bound on this rig; "
                    "stage01_device_fps is the stable compute signal",
        },
    }
    record = _update_last_good(headline)
    # a successful-but-slow-tunnel run must not under-report the rig: when
    # the best median ever recorded beats this run, embed it (with its own
    # provenance) so the round artifact carries the weather-independent
    # number alongside this run's
    best = (record or {}).get("best_known")
    try:
        best_median = float(best["median_e2e_fps"]) if best else None
    except (KeyError, TypeError, ValueError):
        best_median = None
    if best_median is not None and best_median > headline["median_e2e_fps"]:
        headline["best_known"] = best
        headline["note"] = ("e2e is tunnel-transfer-bound; this run hit a "
                            "slower link window than best_known (same code "
                            "path — see link_provenance of both)")
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
