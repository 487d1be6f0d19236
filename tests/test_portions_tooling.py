"""GT-producing tooling: create fresh portions trees from binary keyframes
(headless equivalent of the reference's pixel-binary annotator output) and
round-trip them through the reference's portions.xml format."""

import numpy as np

from lecturemath_tpu.eval.annotation import (KeyframeAnnotation,
                                             portions_from_binary)
from lecturemath_tpu.utils.synthetic import synthetic_lecture


def _keyframe(binary_ink0, idx):
    raw = np.stack([binary_ink0] * 3, axis=-1)
    kf = KeyframeAnnotation("DB", "lec", idx, 1000.0 * idx, [], raw)
    return kf


def test_portions_reconstruct_binary_exactly():
    frames, _, _ = synthetic_lecture(seed=7, n_frames=12, height=96,
                                     width=128, n_boards=2,
                                     glyphs_per_board=6)
    binary = 255 - frames[-1]  # ink=0 convention

    # synthetic glyphs pack on a tight grid: small merge distance keeps
    # distinct clusters
    portions = portions_from_binary(binary, margin=1, merge_distance=1)
    assert len(portions) >= 2  # spatial clusters, not one blanket portion

    kf = _keyframe(binary, 0)
    kf.portions = portions
    kf.update_binary_image(update_cc=False)
    np.testing.assert_array_equal(kf.binary_image[:, :, 0], binary)


def test_portions_empty_frame():
    assert portions_from_binary(np.full((64, 64), 255, np.uint8)) == []


def test_portions_xml_roundtrip(tmp_path):
    frames, _, _ = synthetic_lecture(seed=8, n_frames=10, height=96,
                                     width=128, n_boards=2,
                                     glyphs_per_board=5)
    keyframes = []
    for idx, t in enumerate((4, 9)):
        binary = 255 - frames[t]
        kf = _keyframe(binary, idx)
        kf.portions = portions_from_binary(binary)
        kf.update_binary_image(update_cc=False)
        keyframes.append(kf)

    out = tmp_path / "annot"
    KeyframeAnnotation.save_portions(keyframes, str(out))

    reloaded = [_keyframe(np.full((96, 128), 255, np.uint8), idx)
                for idx in range(2)]
    KeyframeAnnotation.load_portions(str(out / "portions.xml"), reloaded,
                                     str(out / "portions"))
    for orig, back in zip(keyframes, reloaded):
        assert len(back.portions) == len(orig.portions)
        back.update_binary_image(update_cc=False)
        np.testing.assert_array_equal(back.binary_image[:, :, 0],
                                      orig.binary_image[:, :, 0])
