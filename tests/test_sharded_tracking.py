"""Shard-count invariance of the frame-axis-sharded CC tracker: 1 == 2 == 4
== 8 shards, left fold == tree reduction, in-process == worker processes —
all bit-identical to the sequential CCTracker (whose own parity vs the
reference CCStabilityEstimator is proven in test_tracking_parity.py)."""

import numpy as np
import pytest

from lecturemath_tpu.pipeline.cc_sharded import (merge_trackers,
                                                 track_sharded)
from lecturemath_tpu.pipeline.cc_tracking import CCTracker
from lecturemath_tpu.utils.synthetic import synthetic_lecture


def assert_trackers_equal(a: CCTracker, b: CCTracker):
    assert a.img_idx == b.img_idx
    assert len(a.unique_ccs) == len(b.unique_ccs)
    for cc_a, cc_b in zip(a.unique_ccs, b.unique_ccs):
        assert (cc_a.min_x, cc_a.max_x, cc_a.min_y, cc_a.max_y, cc_a.size) \
            == (cc_b.min_x, cc_b.max_x, cc_b.min_y, cc_b.max_y, cc_b.size)
        np.testing.assert_array_equal(cc_a.img, cc_b.img)
    assert a.unique_cc_frames == b.unique_cc_frames
    assert [[u for u, _ in frame] for frame in a.cc_idx_per_frame] == \
        [[u for u, _ in frame] for frame in b.cc_idx_per_frame]


def _sequential(frames, min_r, min_p, max_gap):
    tracker = CCTracker(frames[0].shape[1], frames[0].shape[0],
                        min_r, min_p, max_gap)
    for frame in frames:
        tracker.add_frame(frame)
    return tracker


def _downstream_groups(tracker: CCTracker, max_gap: int):
    tracker.split_stable_by_gaps(max_gap, 3)
    stable = tracker.stable_cc_idxs(3)
    time_ov, _, all_ov = tracker.compute_overlapping_stable(stable, 5)
    groups, group_of = tracker.compute_groups(stable, time_ov, 0.0)
    return stable, groups, group_of


# erased content (actives retire -> fast adopt path) and persistent content
# (actives live across every shard boundary -> exact re-match path)
CASES = [
    dict(seed=0, n_frames=48, max_gap=6, jitter=0.03),   # retiring actives
    dict(seed=1, n_frames=48, max_gap=85, jitter=0.0),   # static board
    dict(seed=2, n_frames=40, max_gap=10, jitter=0.06),  # noisy/jittery
]


@pytest.mark.parametrize("case", CASES)
def test_shard_count_invariance(case):
    frames, _, _ = synthetic_lecture(
        seed=case["seed"], n_frames=case["n_frames"], height=96, width=128,
        n_boards=2, glyphs_per_board=5, jitter=case["jitter"])
    min_r = min_p = 0.85
    max_gap = case["max_gap"]

    reference = _sequential(frames, min_r, min_p, max_gap)
    ref_down = _downstream_groups(reference, max_gap)

    for n_shards in (2, 4, 8):
        sharded = track_sharded(frames, min_r, min_p, max_gap,
                                n_shards=n_shards)
        assert_trackers_equal(reference, sharded)
        assert _downstream_groups(sharded, max_gap) == ref_down


def test_tree_reduction_matches_fold():
    frames, _, _ = synthetic_lecture(seed=3, n_frames=48, height=96,
                                     width=128, n_boards=2,
                                     glyphs_per_board=5, jitter=0.03)
    fold = track_sharded(frames, 0.85, 0.85, 8, n_shards=8)
    tree = track_sharded(frames, 0.85, 0.85, 8, n_shards=8, tree_reduce=True)
    assert_trackers_equal(fold, tree)


def test_merge_is_associative():
    """(A + B) + C == A + (B + C) == sequential."""
    from lecturemath_tpu.data.cc import extract_ccs
    from lecturemath_tpu.pipeline.cc_sharded import track_shard

    frames, _, _ = synthetic_lecture(seed=4, n_frames=36, height=96,
                                     width=128, n_boards=2,
                                     glyphs_per_board=5, jitter=0.03)
    args = (128, 96, 0.85, 0.85, 7)

    def shard(lo, hi):
        return track_shard([extract_ccs(f) for f in frames[lo:hi]], *args)

    left_assoc = merge_trackers(merge_trackers(shard(0, 12), shard(12, 24)),
                                shard(24, 36))
    right_assoc = merge_trackers(shard(0, 12),
                                 merge_trackers(shard(12, 24), shard(24, 36)))
    sequential = _sequential(frames, 0.85, 0.85, 7)

    assert_trackers_equal(sequential, left_assoc)
    assert_trackers_equal(sequential, right_assoc)


def test_stage02_cli_surface(tmp_path):
    """-cc_shards N on the stage-02 surface produces the identical tracker
    artifact (user-facing wiring of the sharded path)."""
    from test_e2e_pipeline import DB_XML
    from lecturemath_tpu.pipeline.driver import PipelineDriver
    from lecturemath_tpu.pipeline.stages import stage02_cc_analysis
    from lecturemath_tpu.pipeline.video import compress_png

    (tmp_path / "db.xml").write_text(DB_XML)
    (tmp_path / "test.conf").write_text("\n".join([
        f"VIDEO_DATABASE_PATH = {tmp_path}/db.xml",
        f"OUTPUT_PATH = {tmp_path}/output",
        "BINARIZATION_OUTPUT = tempo_binary_",
        "CC_STABILITY_OUTPUT = tempo_stability_",
        "CC_STABILITY_MIN_RECALL = 0.85",
        "CC_STABILITY_MIN_PRECISION = 0.85",
        "CC_STABILITY_MAX_GAP = 10",
    ]))
    frames, _, _ = synthetic_lecture(seed=6, n_frames=24, height=96,
                                     width=128, n_boards=2,
                                     glyphs_per_board=5, jitter=0.02)
    times = [1000.0 * t for t in range(len(frames))]
    indices = [30 * t for t in range(len(frames))]

    def run(argv):
        driver = PipelineDriver.from_config_path(
            str(tmp_path / "test.conf"), list(argv), "BINARIZATION_OUTPUT",
            "CC_STABILITY_OUTPUT")
        driver.store.save((times, indices, compress_png(list(frames))),
                          "tempo_binary_", "synth01")
        driver.run(stage02_cc_analysis)
        return driver.store.load("tempo_stability_", "synth01")[2]

    sequential = run([])
    sharded = run(["-cc_shards", "4"])
    assert_trackers_equal(sequential, sharded)


def test_worker_process_path():
    frames, _, _ = synthetic_lecture(seed=5, n_frames=24, height=96,
                                     width=128, n_boards=1,
                                     glyphs_per_board=5, jitter=0.03)
    sequential = _sequential(frames, 0.85, 0.85, 6)
    pooled = track_sharded(frames, 0.85, 0.85, 6, n_shards=4, n_workers=2)
    assert_trackers_equal(sequential, pooled)


def test_express_honors_shards(tmp_path):
    """CC_ANALYSIS_SHARDS in the express runner yields the same summary as
    the streaming path (sharded tracking is bit-identical)."""
    from test_e2e_pipeline import DB_XML
    from lecturemath_tpu.pipeline.driver import PipelineDriver
    from lecturemath_tpu.pipeline.express import run_lecture

    frames, _, _ = synthetic_lecture(seed=12, n_frames=24, height=96,
                                     width=128, n_boards=2,
                                     glyphs_per_board=5, jitter=0.0)

    class CleanBinarizer:
        def stream_source(self, source, frames_limit=0, invert=True):
            times = [1000.0 * t for t in range(len(frames))]
            indices = [30 * t for t in range(len(frames))]
            half = len(frames) // 2
            yield times[:half], indices[:half], [f.copy() for f in frames[:half]]
            yield times[half:], indices[half:], [f.copy() for f in frames[half:]]

    (tmp_path / "db.xml").write_text(DB_XML)
    base_conf = [
        f"VIDEO_DATABASE_PATH = {tmp_path}/db.xml",
        f"OUTPUT_PATH = {tmp_path}/output",
        "CC_STABILITY_MIN_RECALL = 0.85",
        "CC_STABILITY_MIN_PRECISION = 0.85",
        "CC_STABILITY_MAX_GAP = 10",
        "VIDEO_SEGMENTATION_DEL_EVENT_MIN_LENGTH = 3",
        "VIDEO_SEGMENTATION_DEL_EVENT_ADD_THRESHOLD = 0.00005",
        "VIDEO_SEGMENTATION_DEL_EVENT_THRESHOLD = 0.0008",
    ]

    def run(extra):
        (tmp_path / "e.conf").write_text("\n".join(base_conf + extra))
        driver = PipelineDriver.from_config_path(str(tmp_path / "e.conf"),
                                                 [], None, None)
        return run_lecture(driver, driver.database.lectures[0],
                           CleanBinarizer(), export=False)

    plain = run([])
    sharded = run(["CC_ANALYSIS_SHARDS = 4"])
    assert plain[0] == sharded[0] and plain[1] == sharded[1]
    for a, b in zip(plain[2], sharded[2]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("n_workers", [0, 2])
def test_streaming_sharded_tracker(n_workers):
    """StreamingShardedTracker (shard per drained batch, incremental merge,
    optional worker pool) is bit-identical to sequential tracking."""
    from lecturemath_tpu.pipeline.cc_sharded import StreamingShardedTracker

    frames, _, _ = synthetic_lecture(seed=7, n_frames=40, height=96,
                                     width=128, n_boards=2,
                                     glyphs_per_board=5, jitter=0.03)
    sequential = _sequential(frames, 0.85, 0.85, 8)

    streaming = StreamingShardedTracker(128, 96, 0.85, 0.85, 8,
                                        n_workers=n_workers)
    for start in range(0, len(frames), 7):  # uneven batch granularity
        streaming.add_frames(list(frames[start:start + 7]))
    assert_trackers_equal(sequential, streaming.finish())


def test_streaming_sharded_tracker_empty():
    from lecturemath_tpu.pipeline.cc_sharded import StreamingShardedTracker

    tracker = StreamingShardedTracker(128, 96, 0.85, 0.85, 8).finish()
    assert tracker.img_idx == 0 and not tracker.unique_ccs


def test_streaming_tracker_chunk_frames():
    """chunk_frames coarsens shard granularity without changing results."""
    from lecturemath_tpu.pipeline.cc_sharded import StreamingShardedTracker

    frames, _, _ = synthetic_lecture(seed=8, n_frames=30, height=96,
                                     width=128, n_boards=2,
                                     glyphs_per_board=4, jitter=0.02)
    sequential = _sequential(frames, 0.85, 0.85, 8)

    streaming = StreamingShardedTracker(128, 96, 0.85, 0.85, 8,
                                        chunk_frames=13)
    for start in range(0, len(frames), 4):  # batches smaller than chunks
        streaming.add_frames(list(frames[start:start + 4]))
    assert_trackers_equal(sequential, streaming.finish())


@pytest.mark.parametrize("seed", range(6))
def test_shard_invariance_shape_fuzz(seed):
    """Randomized lecture shapes (board counts, glyph density, sizes,
    gap settings, jitter, odd shard-boundary placement via n_frames) —
    sharded tracking stays bit-identical to sequential at every shard
    count, uneven splits included."""
    rng = np.random.default_rng(600 + seed)
    frames, _, _ = synthetic_lecture(
        seed=seed * 13 + 3, n_frames=int(rng.integers(9, 60)),
        height=int(rng.integers(48, 140)),
        width=int(rng.integers(64, 180)),
        n_boards=int(rng.integers(1, 4)),
        glyphs_per_board=int(rng.integers(1, 8)),
        jitter=float(rng.uniform(0.0, 0.07)))
    min_r = min_p = float(rng.choice([0.8, 0.85, 0.9]))
    max_gap = int(rng.integers(3, 20))

    reference = _sequential(frames, min_r, min_p, max_gap)
    ref_down = _downstream_groups(reference, max_gap)
    for n_shards in (2, 3, 5, 8):           # 3/5 force uneven splits
        sharded = track_sharded(frames, min_r, min_p, max_gap,
                                n_shards=n_shards)
        assert_trackers_equal(reference, sharded)
        assert _downstream_groups(sharded, max_gap) == ref_down


def test_track_sharded_empty_input_is_clear_error():
    """Frame dimensions are unknowable from an empty list - must raise a
    named error, not IndexError (the streaming frontend, built with
    explicit dimensions, returns an empty tracker instead)."""
    with pytest.raises(ValueError, match="no frames to track"):
        track_sharded([], n_shards=4)


def test_streaming_tracker_abort_releases_pool():
    """abort() must shut the worker pool down so an aborted stream (e.g. a
    device fetch timeout mid-lecture) doesn't leak processes or block
    interpreter exit on queued shards."""
    from lecturemath_tpu.pipeline.cc_sharded import StreamingShardedTracker

    tracker = StreamingShardedTracker(64, 48, 0.9, 0.9, 8, n_workers=2)
    frame = np.zeros((48, 64), np.uint8)
    frame[10:20, 10:20] = 255
    tracker.add_frames([frame, frame])
    assert tracker._pool is not None
    tracker.abort()
    assert tracker._pool is None
    assert tracker._futures == [] and tracker._buffer == []
    # abort is idempotent, and finish() after abort still yields a tracker
    # (whatever prefix was already folded, or an empty one)
    tracker.abort()
    assert tracker.finish() is not None


# ------------------------------------------------- slim mode (memory lever)

def _full_downstream(tracker: CCTracker, max_gap: int):
    """Everything stage 03-05 derive from a tracker, through clean frames."""
    tracker.split_stable_by_gaps(max_gap, 3)
    stable = tracker.stable_cc_idxs(3)
    time_ov, n_pairs, all_ov = tracker.compute_overlapping_stable(stable, 5)
    groups, group_of = tracker.compute_groups(stable, time_ov, 0.0)
    group_ages, groups_per_frame = tracker.compute_group_ages(groups)
    conflicts = tracker.compute_conflicts(stable, all_ov, len(groups),
                                          group_of)
    group_images, group_boundaries = tracker.compute_group_images(
        groups, group_ages, 0.5)
    clean = tracker.clean_frames_from_groups(
        groups, group_boundaries, groups_per_frame, group_ages, group_images)
    return (stable, n_pairs, groups, group_ages, groups_per_frame, conflicts,
            group_boundaries,
            [img.tobytes() for imgs in group_images.values() for img in imgs],
            [frame.tobytes() for frame in clean])


@pytest.mark.parametrize("case", CASES)
def test_slim_tracker_matches_full_downstream(case):
    """keep_frame_masks=False drops per-frame mask crops (the full-lecture
    RSS driver) without changing ANY stage 03-05 output: stage-03
    computations only read first-seen masks in unique_ccs."""
    frames, _, _ = synthetic_lecture(
        seed=case["seed"], n_frames=case["n_frames"], height=96, width=128,
        n_boards=2, glyphs_per_board=5, jitter=case["jitter"])
    min_r = min_p = 0.85
    max_gap = case["max_gap"]

    full = _sequential(frames, min_r, min_p, max_gap)
    slim = CCTracker(128, 96, min_r, min_p, max_gap, keep_frame_masks=False)
    for frame in frames:
        slim.add_frame(frame)

    # identity of assignments + unique (first-seen) masks intact
    assert slim.unique_cc_frames == full.unique_cc_frames
    for cc_a, cc_b in zip(full.unique_ccs, slim.unique_ccs):
        np.testing.assert_array_equal(cc_a.img, cc_b.img)
    # per-frame crops actually dropped (bbox/size metadata kept)
    assert all(cc.img is None for f in slim.cc_idx_per_frame for _, cc in f)
    assert [[(u, cc.min_x, cc.max_x, cc.min_y, cc.max_y, cc.size)
             for u, cc in f] for f in slim.cc_idx_per_frame] == \
        [[(u, cc.min_x, cc.max_x, cc.min_y, cc.max_y, cc.size)
          for u, cc in f] for f in full.cc_idx_per_frame]

    assert _full_downstream(slim, max_gap) == _full_downstream(full, max_gap)

    with pytest.raises(ValueError, match="keep_frame_masks"):
        slim.rebuilt_binary_frames()


def test_slim_sharded_variants_match_full():
    """Slim mode through every sharded frontend: left fold, tree reduction,
    and the streaming tracker all equal the full sequential results."""
    from lecturemath_tpu.pipeline.cc_sharded import StreamingShardedTracker

    frames, _, _ = synthetic_lecture(seed=7, n_frames=40, height=96,
                                     width=128, n_boards=2,
                                     glyphs_per_board=5, jitter=0.03)
    max_gap = 8
    full = _sequential(frames, 0.85, 0.85, max_gap)
    expected = _full_downstream(full, max_gap)

    fold = track_sharded(frames, 0.85, 0.85, max_gap, n_shards=4,
                         keep_frame_masks=False)
    tree = track_sharded(frames, 0.85, 0.85, max_gap, n_shards=4,
                         tree_reduce=True, keep_frame_masks=False)
    streaming = StreamingShardedTracker(128, 96, 0.85, 0.85, max_gap,
                                        keep_frame_masks=False)
    for lo in range(0, len(frames), 7):
        streaming.add_frames(frames[lo:lo + 7])
    stream = streaming.finish()

    for slim in (fold, tree, stream):
        assert not slim.keep_frame_masks
        assert all(cc.img is None
                   for f in slim.cc_idx_per_frame for _, cc in f)
        assert slim.unique_cc_frames == full.unique_cc_frames
        assert _full_downstream(slim, max_gap) == expected


def test_merge_refuses_slim_right_shard():
    from lecturemath_tpu.data.cc import extract_ccs
    from lecturemath_tpu.pipeline.cc_sharded import (slim_frame_masks,
                                                     track_shard)

    frames, _, _ = synthetic_lecture(seed=8, n_frames=8, height=96,
                                     width=128, n_boards=1,
                                     glyphs_per_board=4, jitter=0.0)
    args = (128, 96, 0.85, 0.85, 7)
    left = track_shard([extract_ccs(f) for f in frames[:4]], *args)
    right = slim_frame_masks(
        track_shard([extract_ccs(f) for f in frames[4:]], *args))
    with pytest.raises(ValueError, match="right shard"):
        merge_trackers(left, right)
