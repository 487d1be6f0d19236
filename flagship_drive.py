"""Flagship integrated drive (VERDICT r4 item 3): production widths through
the REAL user-surface CLIs on the device, end to end.

One scripted run proving the full user story at the flagship model size
(FCN widths 48..768, the reference's production configuration —
reference: FCN_lecturenet.py:371-431 defaults via train config):

  1. build a full-scale synthetic 1080p lecture workspace (real MJPG video
     file, 20 boards / 2,400 unique CCs / >=20 GT keyframes)
  2. TRAIN a production-width checkpoint briefly on device (256^2 crops of
     the decoded video vs the known GT ink — the realistic-weights recipe
     from tests/test_realistic_ab.py, at flagship widths)
  3. run the five STAGED CLIs (binarize on device, 02-05 host) with
     per-stage walls, then the fused express run_pipeline CLI
  4. author a GT annotation tree from the synthetic ground truth
     (eval/gt_authoring.export_gt_tree)
  5. run BOTH eval protocols at the user surface:
     scripts/lecturenet_eval_keyframe_bin.py (binarizes the GT keyframes
     with the trained model on device; CC + pixel metric tables —
     reference: lecturenet_eval_keyframe_bin.py:24-185) and
     cli.eval_summaries (scores the pipeline's exported summary against
     the GT tree — reference: eval_multiple_summaries.py)
  6. write FLAGSHIP_DRIVE.md recording stage walls + both metric tables

Usage:
  JAX_PLATFORMS= python flagship_drive.py [workdir]      # full drive
  python flagship_drive.py --train <workdir>             # phase 2 only
  python flagship_drive.py --gt <workdir>                # phase 4 only

The orchestrator itself never imports jax; every phase runs as a
subprocess with the right backend env (device phases JAX_PLATFORMS=empty,
host phases cpu), exactly as a user would run them.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

DB_NAME = "FlagDB"
LECTURE = "flag01"

# the real AccessMath regime scaled to one drive: 1080p source (2.07 MP —
# below the 2.5 MP cap, so the net runs UNHALVED at full resolution),
# 20 write/erase cycles -> >=20 GT keyframes, 2,400 unique CCs.
# Env-overridable so the test suite can smoke the orchestration tiny.
N_FRAMES = int(os.environ.get("LM_FLAGSHIP_FRAMES", "1200"))
HEIGHT = int(os.environ.get("LM_FLAGSHIP_HEIGHT", "1080"))
WIDTH = int(os.environ.get("LM_FLAGSHIP_WIDTH", "1920"))
N_BOARDS = int(os.environ.get("LM_FLAGSHIP_BOARDS", "20"))
GLYPHS_PER_BOARD = int(os.environ.get("LM_FLAGSHIP_GLYPHS", "120"))

if os.environ.get("LM_FLAGSHIP_TINY"):   # suite smoke: orchestration only
    PRODUCTION_WIDTHS = {
        "DOWN_CONV_FILTERS": (2, 3, 4, 5, 6),
        "MIDDLE_CONV_FILTERS_MIDDLE": 6,
        "UPSAMPLE_FILTERS": (2, 3, 4, 5, 6),
        "UP_CONV_FILTERS": (2, 3, 4, 5, 6),
        "PIXEL_FEATURES": (3, 2),
    }
else:
    PRODUCTION_WIDTHS = {
        "DOWN_CONV_FILTERS": (48, 96, 192, 384, 768),
        "MIDDLE_CONV_FILTERS_MIDDLE": 768,
        "UPSAMPLE_FILTERS": (32, 48, 96, 192, 384),
        "UP_CONV_FILTERS": (32, 48, 96, 192, 384),
        "PIXEL_FEATURES": (32, 16),
    }

TRAIN_STEPS = int(os.environ.get("LM_FLAGSHIP_TRAIN_STEPS", "150"))
TRAIN_BATCH = 8
TRAIN_CROP = min(int(os.environ.get("LM_FLAGSHIP_CROP", "256")),
                 HEIGHT, WIDTH)


def _source():
    from lecturemath_tpu.utils.synthetic import SyntheticRGBLectureSource

    return SyntheticRGBLectureSource(
        seed=42, n_frames=N_FRAMES, height=HEIGHT, width=WIDTH,
        n_boards=N_BOARDS, glyphs_per_board=GLYPHS_PER_BOARD, fps=1.0)


def _gt_keyframes(source):
    """GT keyframe sample indices: the last frame of each board era (the
    frame before each full erase) plus the final frame."""
    indices = sorted(int(t) - 1 for t in source.erase_times if t >= 1)
    if not indices or indices[-1] != source.n_frames - 1:
        indices.append(source.n_frames - 1)
    return indices


# --------------------------------------------------------------- workspace

def build_workspace(root):
    import cv2
    import numpy as np

    conf_path = os.path.join(root, "flagship.conf")
    for sub in ("videos", "models", "output"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    source = _source()
    video_path = os.path.join(root, "videos", f"{LECTURE}.avi")
    if not os.path.exists(video_path):
        print(f"[workspace] rendering {N_FRAMES} x {WIDTH}x{HEIGHT} MJPG "
              f"frames -> {video_path}", flush=True)
        # fps=1.0: one video frame per sampled frame (a 30 fps x1200-sample
        # render would be 36k 1080p JPEG encodes on this 1-core host)
        writer = cv2.VideoWriter(video_path,
                                 cv2.VideoWriter_fourcc(*"MJPG"),
                                 1.0, (WIDTH, HEIGHT))
        for t in range(N_FRAMES):
            writer.write(source.rgb_frame(t)[:, :, ::-1])
        writer.release()
        print(f"[workspace] video: "
              f"{os.path.getsize(video_path) / 1e6:.0f} MB", flush=True)

    db_path = os.path.join(root, "db.xml")
    if not os.path.exists(db_path):
        with open(db_path, "w") as f:
            f.write(f"""<AccessMath><DataBase><Name>{DB_NAME}</Name>
<OutputPaths><Temporal>temporal</Temporal><Images>images</Images>
<Videos>videos</Videos><Annotations>annotations</Annotations>
<Summaries>summaries</Summaries></OutputPaths>
<Datasets><Testing><LectureTitle>{LECTURE}</LectureTitle></Testing></Datasets>
<Lectures><Lecture><Id>{LECTURE}</Id><Title>{LECTURE}</Title>
<Parameters></Parameters>
<Videos><Main><Video><Path>{LECTURE}.avi</Path></Video></Main></Videos>
</Lecture></Lectures></DataBase></AccessMath>
""")

    if not os.path.exists(conf_path):
        lines = [
            f"VIDEO_DATABASE_PATH = {db_path}",
            f"VIDEO_FILES_PATH = {os.path.join(root, 'videos')}",
            f"OUTPUT_PATH = {os.path.join(root, 'output')}",
            "BINARIZATION_OUTPUT = tempo_binary_",
            "CC_STABILITY_OUTPUT = tempo_stability_",
            "CC_RECONSTRUCTED_OUTPUT = tempo_bin_reconstructed_",
            "CC_CONFLICTS_OUTPUT = tempo_cc_conflicts_",
            "CC_ST3D_OUTPUT = tempo_cc_ST3D_",
            "VIDEO_SEGMENTATION_OUTPUT = tempo_intervals_",
            "SUMMARY_KEYFRAMES_OUTPUT = tempo_segments_",
            f"BINARIZATION_FCN_LECTURENET_DIR = "
            f"{os.path.join(root, 'models')}",
            "BINARIZATION_FCN_LECTURENET_FILENAME = flagship.msgpack",
            "FCN_BINARIZER_NET_KERNEL_SIZE = 3",
            "FCN_BINARIZER_NET_PIXEL_KERNEL_SIZE = 7",
            "UPLOAD_FORMAT = auto",
            "SAMPLING_FPS = 1.0",
            "CC_STABILITY_MIN_RECALL = 0.85",
            "CC_STABILITY_MIN_PRECISION = 0.85",
            "CC_STABILITY_MAX_GAP = 10",
            "CC_STABILITY_MIN_TIMES = 3",
            "CC_GROUPING_MIN_IMAGE_THRESHOLD = 0.5",
            "CC_GROUPING_TEMPORAL_WINDOW = 5",
            "CC_GROUPING_MIN_RECALL = 0.5",
            "VIDEO_SEGMENTATION_METHOD = 3",
            "VIDEO_SEGMENTATION_DEL_EVENT_MIN_LENGTH = 3",
            "VIDEO_SEGMENTATION_DEL_EVENT_ADD_THRESHOLD = 0.00005",
            "VIDEO_SEGMENTATION_DEL_EVENT_THRESHOLD = 0.0008",
            f"FCN_BINARIZER_SAVE_BINARY_PATH = "
            f"{os.path.join(root, 'output', 'eval_binaries')}",
        ]
        for key, value in PRODUCTION_WIDTHS.items():
            if isinstance(value, tuple):
                lines += [f"FCN_BINARIZER_NET_{key}_{i + 1} = {v}"
                          for i, v in enumerate(value)]
            else:
                lines.append(f"FCN_BINARIZER_NET_{key} = {value}")
        with open(conf_path, "w") as f:
            f.write("\n".join(lines) + "\n")
    return conf_path


# ---------------------------------------------------------------- training

def train_phase(root):
    """Brief on-device training of the production-width net on decoded
    video crops vs GT ink: enough that binarization is LEARNED (not a
    random net), not enough to saturate logits — the realistic regime
    tests/test_realistic_ab.py established at tiny widths."""
    import cv2
    import numpy as np

    from lecturemath_tpu.core.backend_probe import ensure_backend

    ensure_backend()

    import jax
    import jax.numpy as jnp

    from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig,
                                                       FCNLectureNet)
    from lecturemath_tpu.pipeline.binarize import save_checkpoint_variables
    from lecturemath_tpu.train.trainer import Trainer

    source = _source()
    video_path = os.path.join(root, "videos", f"{LECTURE}.avi")
    capture = cv2.VideoCapture(video_path)
    # train on DECODED frames (codec noise included), spread over the
    # lecture; targets from the synthetic GT at the same indices
    train_indices = list(range(3, N_FRAMES, max(1, N_FRAMES // 32)))[:32]
    frames, targets = [], []
    for t in train_indices:
        capture.set(cv2.CAP_PROP_POS_FRAMES, t)
        ok, frame = capture.read()
        assert ok, f"decode failed at {t}"
        frames.append(frame[:, :, ::-1])
        targets.append((source.binary_frame(t) == 0).astype(np.float32))
    capture.release()
    frames = np.stack(frames).astype(np.float32) / 127.5 - 1.0
    targets = np.stack(targets)[..., None]   # ink=0 / bg=1

    net_config = FCNConfig(
        down_filters=PRODUCTION_WIDTHS["DOWN_CONV_FILTERS"],
        mid_filters=PRODUCTION_WIDTHS["MIDDLE_CONV_FILTERS_MIDDLE"],
        upsample_filters=PRODUCTION_WIDTHS["UPSAMPLE_FILTERS"],
        up_filters=PRODUCTION_WIDTHS["UP_CONV_FILTERS"],
        pixel_features=PRODUCTION_WIDTHS["PIXEL_FEATURES"],
        kernel_size=3, pixel_kernel_size=7)
    model = FCNLectureNet(net_config, dtype=jnp.float32)
    trainer = Trainer(model, learning_rate=0.05, phase="binarizer")
    state = trainer.init_state(jax.random.PRNGKey(3),
                               (1, TRAIN_CROP, TRAIN_CROP, 3))

    rng = np.random.default_rng(0)
    t_train = time.time()
    losses = []
    for step in range(TRAIN_STEPS):
        img = np.empty((TRAIN_BATCH, TRAIN_CROP, TRAIN_CROP, 3), np.float32)
        tgt = np.empty((TRAIN_BATCH, TRAIN_CROP, TRAIN_CROP, 1), np.float32)
        for b in range(TRAIN_BATCH):
            k = rng.integers(len(frames))
            # max(1, ...): integers(0) raises; offset 0 when crop == frame
            y = rng.integers(max(1, HEIGHT - TRAIN_CROP))
            x = rng.integers(max(1, WIDTH - TRAIN_CROP))
            img[b] = frames[k, y:y + TRAIN_CROP, x:x + TRAIN_CROP]
            tgt[b] = targets[k, y:y + TRAIN_CROP, x:x + TRAIN_CROP]
        batch = {"image": jnp.asarray(img), "target": jnp.asarray(tgt),
                 "text_mask": jnp.asarray(tgt)}
        state, metrics = trainer.step(state, batch)
        if step % 25 == 0 or step == TRAIN_STEPS - 1:
            loss = float(jax.device_get(metrics["total"]))
            losses.append([step, round(loss, 4)])
            print(f"[train] step {step}: total={loss:.4f}", flush=True)
    train_wall = time.time() - t_train

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    # quality gate on a held-out full-res frame (center crop to bound
    # device memory): the drive is meaningless with an untrained net
    ph, pw = min(512, HEIGHT), min(768, WIDTH)
    probe = jnp.asarray(frames[:1, :ph, :pw])
    logits, _, _ = model.apply(variables, probe, train=False)
    pred = np.asarray(jax.device_get(
        jax.nn.sigmoid(logits[..., 0]))) * 255 >= 128
    acc = float((pred == (targets[0, :ph, :pw, 0] > 0.5)).mean())
    print(f"[train] held-out pixel acc ({ph}x{pw} crop): {acc:.4f}",
          flush=True)

    model_path = os.path.join(root, "models", "flagship.msgpack")
    save_checkpoint_variables(variables, model_path)
    with open(os.path.join(root, "train_stats.json"), "w") as f:
        json.dump({"steps": TRAIN_STEPS, "batch": TRAIN_BATCH,
                   "crop": TRAIN_CROP, "losses": losses,
                   "train_wall_s": round(train_wall, 1),
                   "pixel_acc": round(acc, 4),
                   "checkpoint_mb": round(
                       os.path.getsize(model_path) / 1e6, 1)}, f)
    print(f"[train] saved {model_path} "
          f"({os.path.getsize(model_path) / 1e6:.0f} MB)", flush=True)


# ---------------------------------------------------------------- GT tree

def gt_phase(root):
    import cv2
    import numpy as np

    from lecturemath_tpu.eval.gt_authoring import export_gt_tree

    source = _source()
    indices = _gt_keyframes(source)
    print(f"[gt] {len(indices)} GT keyframes at {indices}", flush=True)

    video_path = os.path.join(root, "videos", f"{LECTURE}.avi")
    capture = cv2.VideoCapture(video_path)
    raws, binaries, times = [], [], []
    for t in indices:
        capture.set(cv2.CAP_PROP_POS_FRAMES, t)
        ok, frame = capture.read()
        assert ok, f"decode failed at {t}"
        raws.append(frame[:, :, ::-1].copy())
        binaries.append(255 - source.binary_frame(t))   # GT ink=0 polarity
        times.append(t * 1000.0)
    capture.release()

    # era boundaries as segments (absolute frame indices; fps=1.0 so
    # sample index == video frame index)
    bounds = [0] + sorted(int(t) for t in source.erase_times
                          if 0 < t < source.n_frames) + [source.n_frames]
    segments = list(zip(bounds[:-1], bounds[1:]))

    n_ccs = sum(int(cv2.connectedComponents((b == 0).astype(np.uint8))[0])
                for b in binaries)
    print(f"[gt] total GT CCs across keyframes: {n_ccs}", flush=True)

    prefix = export_gt_tree(
        os.path.join(root, "output", "annotations"), DB_NAME, LECTURE,
        indices, times, binaries, raw_keyframes=raws, segments=segments,
        video_paths=(f"{LECTURE}.avi",),
        # the keyframe_bin eval loader (mirroring the reference
        # LoadDatasetKeyframes) requires the portions tree
        write_portions=True)
    with open(os.path.join(root, "gt_stats.json"), "w") as f:
        json.dump({"keyframes": len(indices), "gt_ccs": n_ccs,
                   "segments": len(segments)}, f)
    print(f"[gt] tree -> {prefix}", flush=True)


# ------------------------------------------------------------ orchestrator

def _run(label, cmd, env_extra, log_dir, device=False):
    env = dict(os.environ)
    if device:
        env["JAX_PLATFORMS"] = ""
    else:
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    env.update(env_extra or {})
    print(f"\n=== {label}: {' '.join(cmd)}", flush=True)
    start = time.time()
    res = subprocess.run(cmd, env=env, cwd=REPO, text=True,
                         capture_output=True)
    wall = time.time() - start
    log_path = os.path.join(log_dir, label.replace(" ", "_") + ".log")
    with open(log_path, "w") as f:
        f.write(res.stdout + "\n--- stderr ---\n" + res.stderr)
    tail = "\n".join(res.stdout.strip().splitlines()[-4:])
    print(tail, flush=True)
    print(f"=== {label}: {wall:.1f}s (exit {res.returncode})", flush=True)
    if res.returncode != 0:
        print(res.stdout[-2000:] + res.stderr[-2000:], flush=True)
        raise SystemExit(f"{label} failed — see {log_path}")
    return wall, res.stdout


def main():
    if "--train" in sys.argv:
        return train_phase(os.path.abspath(sys.argv[-1]))
    if "--gt" in sys.argv:
        return gt_phase(os.path.abspath(sys.argv[-1]))

    root = os.path.abspath(sys.argv[1] if len(sys.argv) > 1
                           else "/tmp/flagship_ws")
    os.makedirs(root, exist_ok=True)
    log_dir = os.path.join(root, "logs")
    os.makedirs(log_dir, exist_ok=True)

    total_start = time.time()
    conf = build_workspace(root)
    walls = {}
    py = sys.executable
    me = os.path.abspath(__file__)

    walls["train"], _ = _run(
        "train checkpoint", [py, me, "--train", root], None, log_dir,
        device=True)

    for stage, mod, device in (
            ("stage01 binarize", "lecturemath_tpu.cli.binarize", True),
            ("stage02 cc_analysis", "lecturemath_tpu.cli.cc_analysis",
             False),
            ("stage03 cc_grouping", "lecturemath_tpu.cli.cc_grouping",
             False),
            ("stage04 vid_segmentation",
             "lecturemath_tpu.cli.vid_segmentation", False),
            ("stage05 generate_summary",
             "lecturemath_tpu.cli.generate_summary", False)):
        walls[stage], _ = _run(stage, [py, "-m", mod, conf, "-d", "testing"],
                               None, log_dir, device=device)

    walls["express run_pipeline"], _ = _run(
        "express run_pipeline",
        [py, "-m", "lecturemath_tpu.cli.run_pipeline", conf, "-d",
         "testing"], None, log_dir, device=True)

    walls["gt authoring"], _ = _run(
        "gt authoring", [py, me, "--gt", root], None, log_dir)

    walls["eval keyframe_bin"], kb_out = _run(
        "eval keyframe_bin",
        [py, os.path.join(REPO, "scripts", "lecturenet_eval_keyframe_bin.py"),
         conf, os.path.join(root, "models", "flagship.msgpack"), "1"],
        None, log_dir, device=True)

    walls["eval summaries"], es_out = _run(
        "eval summaries",
        [py, "-m", "lecturemath_tpu.cli.eval_summaries", conf, "-d",
         "testing"], None, log_dir)

    report(root, conf, walls, kb_out, es_out,
           round(time.time() - total_start, 1))


def report(root, conf, walls, kb_out, es_out, total_wall):
    train_stats = json.load(open(os.path.join(root, "train_stats.json")))
    gt_stats = json.load(open(os.path.join(root, "gt_stats.json")))
    kf_dir = os.path.join(root, "output", "summaries",
                          f"{DB_NAME}_{LECTURE}", "keyframes")
    n_summary_kf = len(os.listdir(kf_dir)) if os.path.isdir(kf_dir) else 0

    lines = [
        "# Flagship integrated drive (VERDICT r4 item 3)",
        "",
        f"Production-width ({PRODUCTION_WIDTHS['DOWN_CONV_FILTERS'][0]}.."
        f"{PRODUCTION_WIDTHS['MIDDLE_CONV_FILTERS_MIDDLE']}) end-to-end "
        "drive through the real "
        "CLIs on the device — train -> 5 staged CLIs -> express -> GT "
        "authoring -> both eval protocols. Reproduce with "
        "`JAX_PLATFORMS= python flagship_drive.py /tmp/flagship_ws` "
        "(logs land in <workdir>/logs/).",
        "",
        f"- Workload: {N_FRAMES} sampled frames @ {WIDTH}x{HEIGHT} "
        f"({WIDTH * HEIGHT / 1e6:.2f} MP, "
        f"{'below' if WIDTH * HEIGHT <= 2.5e6 else 'above'} the 2.5 MP "
        f"cap -> the net runs "
        f"{'UNHALVED' if WIDTH * HEIGHT <= 2.5e6 else 'HALVED'}), "
        f"{N_BOARDS} boards, "
        f"{N_BOARDS * GLYPHS_PER_BOARD} unique CCs, MJPG video "
        f"({os.path.getsize(os.path.join(root, 'videos', LECTURE + '.avi')) / 1e6:.0f} MB)",
        f"- Model: FCN widths "
        f"{PRODUCTION_WIDTHS['DOWN_CONV_FILTERS'][0]}.."
        f"{PRODUCTION_WIDTHS['MIDDLE_CONV_FILTERS_MIDDLE']}, "
        f"pixel kernel 7 ({train_stats['checkpoint_mb']} MB checkpoint)",
        f"- Training: {train_stats['steps']} SGD steps @ batch "
        f"{train_stats['batch']} x {train_stats['crop']}^2 on device in "
        f"{train_stats['train_wall_s']}s; held-out pixel acc "
        f"{train_stats['pixel_acc']}",
        f"- GT tree: {gt_stats['keyframes']} keyframes, "
        f"{gt_stats['gt_ccs']} GT CCs, {gt_stats['segments']} segments",
        f"- Summary keyframes exported: {n_summary_kf}",
        f"- Total drive wall: {total_wall}s",
        "",
        "## Stage walls (subprocess wall incl. interpreter + compile-cache "
        "hits)",
        "",
        "| phase | wall (s) |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v:.1f} |" for k, v in walls.items()]
    lines += [
        "",
        "## eval: lecturenet_eval_keyframe_bin (CC + pixel metrics, "
        "trained flagship net vs GT)",
        "",
        "```",
        kb_out.strip(),
        "```",
        "",
        "## eval: eval_summaries (pipeline summary vs GT tree)",
        "",
        "```",
        es_out.strip(),
        "```",
        "",
    ]
    # tiny smokes report into the workdir; only the real-scale drive owns
    # the committed repo artifact
    out = (os.path.join(root, "FLAGSHIP_DRIVE.md")
           if os.environ.get("LM_FLAGSHIP_TINY")
           else os.path.join(REPO, "FLAGSHIP_DRIVE.md"))
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"\nwrote {out}", flush=True)


if __name__ == "__main__":
    main()
