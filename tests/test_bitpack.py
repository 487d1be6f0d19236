import numpy as np

from lecturemath_tpu.models.fcn_lecturenet import pack_bits, unpack_bits_host


def test_pack_unpack_round_trip():
    rng = np.random.default_rng(0)
    for width in (64, 100, 129):  # multiple of 8, padded, padded
        binary = (rng.random((3, 40, width)) < 0.3).astype(np.uint8) * 255
        packed = np.asarray(pack_bits(binary))
        assert packed.shape == (3, 40, (width + 7) // 8)
        restored = unpack_bits_host(packed, width)
        np.testing.assert_array_equal(restored, binary)


def test_pack_matches_numpy_packbits():
    rng = np.random.default_rng(1)
    binary = (rng.random((2, 16, 64)) < 0.5).astype(np.uint8)
    packed = np.asarray(pack_bits(binary))
    expected = np.packbits(binary, axis=-1)
    np.testing.assert_array_equal(packed, expected)
