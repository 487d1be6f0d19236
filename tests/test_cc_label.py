import numpy as np
from scipy import ndimage

from lecturemath_tpu.ops.cc_label import (label_components,
                                          label_components_batch,
                                          compact_labels)


def random_blobs(rng, h=64, w=64, density=0.25):
    img = (rng.random((h, w)) < density).astype(np.uint8)
    # dilate a bit so we get blobs instead of salt noise
    img = ndimage.binary_dilation(img, iterations=1).astype(np.uint8)
    return img


def test_matches_scipy_label():
    rng = np.random.default_rng(0)
    for _ in range(3):
        img = random_blobs(rng)
        ours, n_ours = compact_labels(np.asarray(label_components(img)))
        ref, n_ref = ndimage.label(img)
        assert n_ours == n_ref
        # compact_labels orders roots by raster-first-pixel == scipy order
        np.testing.assert_array_equal(ours, ref)


def test_empty_and_full():
    empty = np.zeros((32, 32), dtype=np.uint8)
    labels, n = compact_labels(np.asarray(label_components(empty)))
    assert n == 0 and labels.max() == 0

    full = np.ones((32, 32), dtype=np.uint8)
    labels, n = compact_labels(np.asarray(label_components(full)))
    assert n == 1
    assert (labels == 1).all()


def test_diagonal_not_connected():
    # 4-connectivity: diagonal touch = two components (matches scipy default)
    img = np.zeros((8, 8), dtype=np.uint8)
    img[1, 1] = 1
    img[2, 2] = 1
    _, n = compact_labels(np.asarray(label_components(img)))
    assert n == 2


def test_batch():
    rng = np.random.default_rng(1)
    batch = np.stack([random_blobs(rng, 32, 32) for _ in range(4)])
    out = np.asarray(label_components_batch(batch))
    for i in range(4):
        ours, n_ours = compact_labels(out[i])
        ref, n_ref = ndimage.label(batch[i])
        assert n_ours == n_ref
        np.testing.assert_array_equal(ours, ref)


def test_snake_shape():
    # long winding path stresses propagation distance / pointer jumping
    img = np.zeros((48, 48), dtype=np.uint8)
    for row in range(0, 48, 4):
        img[row, :] = 1
        if (row // 4) % 2 == 0:
            img[row:row + 5, -1] = 1
        else:
            img[row:row + 5, 0] = 1
    ours, n_ours = compact_labels(np.asarray(label_components(img)))
    ref, n_ref = ndimage.label(img)
    assert n_ours == n_ref == 1
    np.testing.assert_array_equal(ours, ref)
