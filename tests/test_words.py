"""Word/formula annotation tier: keyframe projections, word segmentation,
unique-word groups, and formula CC groups (eval/words.py) — XML round
trips plus oracle interop with the reference loaders
(keyframe_projection.py, unique_word_group.py, formula_ccs.py)."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from lecturemath_tpu.data.cc import CC
from lecturemath_tpu.eval.annotation import KeyframeAnnotation, UniqueCCGroup
from lecturemath_tpu.eval.words import (FormulaCCs, KeyFrameProjection,
                                        KeyFrameWords, UniqueWordGroup,
                                        load_formulas, load_projections,
                                        load_unique_words,
                                        load_word_annotations, save_formulas,
                                        save_projections, save_unique_words,
                                        save_word_annotations, word_id)


def _keyframe(idx: int, height: int = 96, width: int = 128,
              blobs=((10, 10), (10, 60), (50, 30))) -> KeyframeAnnotation:
    """A keyframe whose binary has well-separated ink blobs (words)."""
    binary = np.full((height, width), 255, np.uint8)
    for y, x in blobs:
        binary[y:y + 12, x:x + 20] = 0   # ink=0 convention
    raw = np.stack([binary] * 3, axis=-1)
    kf = KeyframeAnnotation("DB", "lec", idx, 1000.0 * idx, [], raw)
    kf.binary_image = np.stack([binary] * 3, axis=-1)
    return kf


# ------------------------------------------------------------- projections

def test_projection_warp_and_xml_roundtrip(tmp_path):
    kf = _keyframe(0)
    proj = KeyFrameProjection.create_default(128, 96)
    src = proj.src_points.copy()
    src[0] += [3.0, 2.0]   # perturb one corner -> non-identity homography
    proj.update_from_points(src, proj.base_dst_points, delta_x=4, delta_y=-2)

    pts = np.array([[20.0, 30.0], [100.0, 80.0]])
    round_trip = proj.warp_points(proj.warp_points(pts), inverse=True)
    np.testing.assert_allclose(round_trip, pts, atol=1e-6)

    rgb, binary, mask = proj.warp_keyframe(kf.raw_image, kf.binary_image,
                                           np.zeros((96, 128), bool))
    assert rgb.shape == (96, 128, 3) and binary.shape == (96, 128, 3)
    assert binary[0, 0, 0] == 255   # border fills white = background
    assert not mask.any()

    path = str(tmp_path / "projections.xml")
    save_projections(path, [proj, KeyFrameProjection.create_default(128, 96)])
    back = load_projections(path)
    assert len(back) == 2
    np.testing.assert_allclose(back[0].H, proj.H)
    np.testing.assert_allclose(back[0].src_points, proj.src_points)
    # the reference round-trips deltas through int()
    assert (back[0].delta_x, back[0].delta_y) == (4, -2)


def test_projection_oracle_load(tmp_path):
    """The reference's own loader reads our projections.xml."""
    from oracle import ensure_oracle
    ensure_oracle()
    from AccessMath.annotation.keyframe_projection import (
        KeyFrameProjection as RefProjection)

    proj = KeyFrameProjection.create_default(128, 96)
    src = proj.src_points.copy()
    src[2] += [-5.0, 4.0]
    proj.update_from_points(src, proj.base_dst_points, 1, 2)
    path = str(tmp_path / "projections.xml")
    save_projections(path, [proj])

    ref = RefProjection.LoadKeyFramesProjectionsFromXML(path, "")
    assert len(ref) == 1
    np.testing.assert_allclose(ref[0].H, proj.H)
    np.testing.assert_allclose(ref[0].src_points, proj.src_points)
    assert (ref[0].delta_x, ref[0].delta_y) == (1, 2)


# ------------------------------------------------------------------- words

def test_words_segmentation_and_roundtrip(tmp_path):
    kfs = [_keyframe(0), _keyframe(1)]
    all_words = []
    for kf in kfs:
        words = KeyFrameWords.create_default(kf)
        words.tree.segment_recursive()
        all_words.append(words)

    boxes = all_words[0].get_words()
    assert len(boxes) == 3   # three separated blobs -> three word leaves
    for x, y, w, h in boxes:
        assert w >= 20 and h >= 12   # enclosing bbox + margin

    in_region = all_words[0].words_in_region(0, 64, 0, 48)
    assert len(in_region) == 1   # only the (10, 10) blob fits the quadrant

    path = str(tmp_path / "word_annotations.xml")
    save_word_annotations(path, all_words)
    back = load_word_annotations(path, kfs)
    assert [w.get_words() for w in back] == [w.get_words()
                                             for w in all_words]


# ------------------------------------------------------------ unique words

def _kf_words(kfs):
    out = []
    for kf in kfs:
        words = KeyFrameWords.create_default(kf)
        words.tree.segment_recursive()
        out.append(words)
    return out


def test_unique_words_roundtrip_and_reconcile(tmp_path):
    kfs = [_keyframe(i) for i in range(3)]
    all_words = _kf_words(kfs)

    # chain every word across all 3 keyframes (same blobs -> same ids)
    sorted_words = [sorted(w.get_words()) for w in all_words]
    groups = []
    for word0, word1, word2 in zip(*sorted_words):
        group = UniqueWordGroup(word0, 0)
        group.words_refs += [word1, word2]
        groups.append(group)

    path = str(tmp_path / "unique_words.xml")
    save_unique_words(path, all_words, groups)
    _, back = load_unique_words(path, all_words)
    assert len(back) == 3
    by_id = {g.str_id(): g for g in back}
    for group in groups:
        loaded = by_id[group.str_id()]
        assert loaded.start_frame == 0 and loaded.last_frame() == 2
        assert list(map(word_id, loaded.words_refs)) == \
            list(map(word_id, group.words_refs))

    # reconcile: keyframe 1's segmentation changed (one blob moved) ->
    # chains truncate at frame 1 and the orphans become singletons
    changed = [_keyframe(0), _keyframe(1, blobs=((10, 10), (10, 60),
                                                 (70, 90))),
               _keyframe(2)]
    changed_words = _kf_words(changed)
    _, reconciled = load_unique_words(path, changed_words)
    lengths = sorted(len(g.words_refs) for g in reconciled)
    # 2 full chains survive only to frame 0 (frame-1 words moved? no --
    # two blobs are unchanged so their chains survive all 3 frames; the
    # moved blob's chain truncates at frame 1, then 1 singleton at frame 1
    # and 1 orphan at frame 2
    starts = sorted((g.start_frame, len(g.words_refs)) for g in reconciled)
    assert (0, 3) in starts and starts.count((0, 3)) == 2
    assert (0, 1) in starts          # truncated moved-blob chain
    assert (1, 1) in starts          # new word at frame 1 -> singleton
    assert (2, 1) in starts          # frame-2 word orphaned by truncation
    assert lengths == [1, 1, 1, 3, 3]


def test_unique_words_oracle_load(tmp_path):
    """The reference's GroupsFromXML reconstructs identical groups from
    our unique_words.xml."""
    from oracle import ensure_oracle
    ensure_oracle()
    from AccessMath.annotation.unique_word_group import (
        UniqueWordGroup as RefGroup)

    kfs = [_keyframe(i) for i in range(3)]
    all_words = _kf_words(kfs)
    sorted_words = [sorted(w.get_words()) for w in all_words]
    groups = []
    for word0, word1, word2 in zip(*sorted_words):
        group = UniqueWordGroup(word0, 0)
        group.words_refs += [word1, word2]
        groups.append(group)
    path = str(tmp_path / "unique_words.xml")
    save_unique_words(path, all_words, groups)

    class _StubKF:
        def __init__(self, words, idx):
            self._words = words
            self.kf_annotation = type("A", (), {"idx": idx})()

        def get_words(self):
            return self._words

    stubs = [_StubKF(w.get_words(), i) for i, w in enumerate(all_words)]
    _, ref_groups = RefGroup.GroupsFromXML(stubs, path)
    ours = sorted((g.start_frame, [word_id(w) for w in g.words_refs])
                  for g in groups)
    theirs = sorted((g.start_frame, [RefGroup.wordID(w)
                                     for w in g.words_refs])
                    for g in ref_groups)
    assert ours == theirs


# ---------------------------------------------------------------- formulas

def _cc_group(start_frame: int, bbox, n_frames: int = 2) -> UniqueCCGroup:
    min_x, min_y, w, h = bbox
    img = np.full((h, w), 255, np.uint8)
    cc = CC(0, min_x, min_x + w - 1, min_y, min_y + h - 1, w * h, img)
    group = UniqueCCGroup(cc, start_frame)
    group.cc_refs += [cc] * (n_frames - 1)
    return group


def test_formulas_roundtrip_and_ordering(tmp_path):
    g_top = _cc_group(0, (30, 5, 8, 6), n_frames=3)
    g_bottom = _cc_group(1, (10, 50, 8, 6), n_frames=2)
    g_late = _cc_group(2, (10, 10, 8, 6), n_frames=1)
    unique_groups = [g_top, g_bottom, g_late]

    f_top = FormulaCCs([g_top], "x^2")
    f_bottom = FormulaCCs([g_bottom], r"\frac{a}{b}")
    f_late = FormulaCCs([g_late], "y")
    assert (f_top.first_frame, f_top.last_frame) == (0, 2)
    assert f_top.visible_at(1) and not f_late.visible_at(1)

    f_multi = FormulaCCs([g_top, g_bottom], "ab")
    assert (f_multi.first_visible, f_multi.last_visible) == (1, 2)
    assert f_multi.bounding_box() == (10, 37, 5, 55)   # x-range, y-range

    path = str(tmp_path / "formulas.xml")
    save_formulas(path, [f_late, f_bottom, f_top])
    back = load_formulas(path, unique_groups)
    assert [f.latex_tag for f in back] == ["x^2", r"\frac{a}{b}", "y"]
    assert back[0].groups_refs == [g_top]

    # member groups gone from the current unique-CC set are dropped
    back_partial = load_formulas(path, [g_top, g_late])
    assert [f.latex_tag for f in back_partial] == ["x^2", "y"]


def test_formulas_oracle_xml_equivalence(tmp_path):
    """Our formula XML is accepted by the reference's FormulasFromXML via
    reference UniqueCCGroups with matching ids."""
    from oracle import ensure_oracle
    ensure_oracle()
    from AccessMath.annotation.formula_ccs import FormulaCCs as RefFormula
    from AccessMath.annotation.unique_cc_group import (
        UniqueCCGroup as RefCCGroup)
    from AM_CommonTools.data.connected_component import ConnectedComponent

    g_a = _cc_group(0, (30, 5, 8, 6), n_frames=3)
    g_b = _cc_group(1, (10, 50, 8, 6), n_frames=2)
    path = str(tmp_path / "formulas.xml")
    save_formulas(path, [FormulaCCs([g_a, g_b], "ab"),
                         FormulaCCs([g_a], "a")])

    def ref_group(group):
        cc = group.cc_refs[0]
        ref_cc = ConnectedComponent(0, cc.min_x, cc.max_x, cc.min_y,
                                    cc.max_y, cc.size, cc.img)
        out = RefCCGroup(ref_cc, group.start_frame)
        out.cc_refs = [ref_cc] * len(group.cc_refs)
        return out

    ref_formulas = RefFormula.FormulasFromXML([ref_group(g_a),
                                               ref_group(g_b)], path)
    assert [f.latex_tag for f in ref_formulas] == ["a", "ab"]
    assert [g.strID() for g in ref_formulas[1].groups_refs] == \
        [g_a.str_id(), g_b.str_id()]


@pytest.mark.parametrize("seed", range(4))
def test_trees_only_fuzz_oracle_load(tmp_path, seed):
    """Shape-fuzzed word trees: random synthetic ink, auto XY-cut
    segmentation, trees-only XML — the reference's own SegmentationTree
    loader must recover the identical word-leaf sets (the fixed-blob
    interop test covers one layout; this sweeps random ones)."""
    from oracle import ensure_oracle
    ensure_oracle()
    from AccessMath.preprocessing.content.segmentation_tree import (
        SegmentationTree)

    from lecturemath_tpu.utils.synthetic import synthetic_lecture

    frames, _, _ = synthetic_lecture(
        seed=seed * 7 + 1, n_frames=6, height=96, width=160, n_boards=1,
        glyphs_per_board=3 + seed * 2)
    kfs = []
    for idx, ink in enumerate([frames[2], frames[-1]]):
        binary = 255 - ink                       # ink=0 convention
        raw = np.stack([binary] * 3, axis=-1)
        kf = KeyframeAnnotation("DB", "lec", idx, 1000.0 * idx, [], raw)
        kf.binary_image = np.stack([binary] * 3, axis=-1)
        kfs.append(kf)

    all_words = []
    for kf in kfs:
        words = KeyFrameWords.create_default(kf)
        words.tree.segment_recursive()
        all_words.append(words)
    path = str(tmp_path / "word_annotations.xml")
    save_word_annotations(path, all_words, trees_only=True)

    binaries = [255 - kf.binary_image[:, :, 0] for kf in kfs]
    trees = SegmentationTree.LoadSegmentationTreesFromXML(path, "",
                                                          binaries)
    ref = [set(tuple(int(v) for v in w) for w in t.collect_all_leaves())
           for t in trees]
    ours = [set(w.get_words()) for w in all_words]
    assert ref == ours
