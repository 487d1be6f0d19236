"""CaffeModelLoader equivalent: parse .caffemodel (binary NetParameter
protobuf) without caffe (reference: AccessMath/util/caffe_model_loader.py:5
wraps caffe.Net; caffe is unavailable and the release ships no caffe
checkpoints, so the test synthesizes one with a hand-rolled protobuf
encoder and round-trips it through the parser)."""

import struct

import numpy as np
import pytest

from lecturemath_tpu.models.caffe_loader import (CaffeModelLoader,
                                                 caffe_conv_to_flax,
                                                 load_caffemodel)


# ------------------------------------------------- tiny protobuf ENCODER

def _varint(value: int) -> bytes:
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _field(number: int, wire: int, payload: bytes) -> bytes:
    return _varint((number << 3) | wire) + payload


def _string(number: int, text: str) -> bytes:
    data = text.encode()
    return _field(number, 2, _varint(len(data)) + data)


def _message(number: int, body: bytes) -> bytes:
    return _field(number, 2, _varint(len(body)) + body)


def _blob(array: np.ndarray, dims: str = "packed") -> bytes:
    body = b""
    if dims == "legacy":
        for field_num, dim in zip((1, 2, 3, 4), array.shape):
            body += _field(field_num, 0, _varint(dim))
    elif dims == "packed":
        # caffe.proto: repeated int64 dim = 1 [packed = true] — what real
        # caffe writes: ONE length-delimited record of varints
        packed_dims = b"".join(_varint(d) for d in array.shape)
        body += _message(7, _field(1, 2, _varint(len(packed_dims))
                                   + packed_dims))
    else:  # unpacked per-element varints (also legal on the wire)
        shape_body = b"".join(_field(1, 0, _varint(d)) for d in array.shape)
        body += _message(7, shape_body)
    packed = array.astype("<f4").tobytes()
    body += _field(5, 2, _varint(len(packed)) + packed)
    return body


def _make_caffemodel(path: str, conv_w, conv_b, dims="packed") -> None:
    # the bias stays new-style even in the legacy case: caffe's old 4-D
    # blobs would pad a (4,) bias to (4,1,1,1), which is a different
    # (also-valid) shape — the kernel blob is the legacy case under test
    conv_layer = (_string(1, "conv1") + _string(2, "Convolution")
                  + _string(3, "data") + _string(4, "conv1")
                  + _message(7, _blob(conv_w, dims))
                  + _message(7, _blob(conv_b, "packed")))
    relu_layer = _string(1, "relu1") + _string(2, "ReLU")
    net = (_string(1, "TinyNet") + _message(100, conv_layer)
           + _message(100, relu_layer))
    with open(path, "wb") as f:
        f.write(net)


@pytest.mark.parametrize("dims", ["packed", "unpacked", "legacy"])
def test_caffemodel_round_trip(tmp_path, dims):
    rng = np.random.default_rng(3)
    conv_w = rng.normal(0, 1, (4, 3, 3, 3)).astype(np.float32)  # OIHW
    conv_b = rng.normal(0, 1, (4,)).astype(np.float32)
    path = str(tmp_path / "tiny.caffemodel")
    _make_caffemodel(path, conv_w, conv_b, dims)

    net = load_caffemodel(path)
    assert net["name"] == "TinyNet"
    assert [(l["name"], l["type"]) for l in net["layers"]] == \
        [("conv1", "Convolution"), ("relu1", "ReLU")]
    conv = net["layers"][0]
    assert conv["bottom"] == ["data"] and conv["top"] == ["conv1"]
    np.testing.assert_array_equal(conv["blobs"][0], conv_w)
    np.testing.assert_array_equal(conv["blobs"][1], conv_b)
    assert net["layers"][1]["blobs"] == []

    # flax mapping: OIHW -> HWIO, the forward actually agrees
    flax_conv = caffe_conv_to_flax(conv["blobs"][0], conv["blobs"][1])
    assert flax_conv["kernel"].shape == (3, 3, 3, 4)

    import torch
    import jax
    import jax.numpy as jnp

    x = rng.normal(0, 1, (1, 8, 8, 3)).astype(np.float32)
    torch_out = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(conv_w), torch.from_numpy(conv_b), padding=1)
    jax_out = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(flax_conv["kernel"]), (1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + flax_conv["bias"]
    np.testing.assert_allclose(np.asarray(jax_out),
                               torch_out.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_loader_surface(tmp_path, capsys):
    conv_w = np.ones((2, 1, 1, 1), np.float32)
    path = str(tmp_path / "m.caffemodel")
    _make_caffemodel(path, conv_w, np.zeros((2,), np.float32))
    loader = CaffeModelLoader(path, model_def="deploy.prototxt")
    assert loader.getModel()["name"] == "TinyNet"
    out = capsys.readouterr().out
    assert "Loading" in out and "complete" in out
