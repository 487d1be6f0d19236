"""Convert a reference PyTorch FCN_LectureNet checkpoint (state_dict) into
flax variables for models.fcn_lecturenet.FCNLectureNet.

The reference releases checkpoints as ``torch.save(model.state_dict())``
(reference: lecturenet_train_02_train_binarizer.py:254-264). This maps those
tensors by name; no torch model code is needed, only the state_dict.

Layout notes:
  * torch Conv2d weight (O, I, kh, kw)          -> flax (kh, kw, I, O)
  * torch ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose with
    transpose_kernel=True, kernel (kh, kw, O, I)
  * torch BatchNorm2d weight/bias               -> flax scale/bias
  * running_mean/running_var                    -> batch_stats mean/var
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv(sd, torch_name) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(_np(sd[f"{torch_name}.weight"]), (2, 3, 1, 0))}
    bias_key = f"{torch_name}.bias"
    if bias_key in sd:
        out["bias"] = _np(sd[bias_key])
    return out


def _deconv(sd, torch_name) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(_np(sd[f"{torch_name}.weight"]), (2, 3, 1, 0))}
    bias_key = f"{torch_name}.bias"
    if bias_key in sd:
        out["bias"] = _np(sd[bias_key])
    return out


def _bn_params(sd, torch_name) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{torch_name}.weight"]),
            "bias": _np(sd[f"{torch_name}.bias"])}


def _bn_stats(sd, torch_name) -> Dict[str, np.ndarray]:
    return {"mean": _np(sd[f"{torch_name}.running_mean"]),
            "var": _np(sd[f"{torch_name}.running_var"])}


def _np(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        tensor = tensor.detach().cpu().numpy()
    # copy=True: torch .numpy() shares memory with the live tensor, and the
    # torch optimizer updates parameters IN PLACE — a view here would let
    # later torch training silently mutate the converted flax variables
    return np.array(tensor, dtype=np.float32, copy=True)


def torch_state_dict_to_flax(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Return {'params': ..., 'batch_stats': ...} for FCNLectureNet.apply."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for i in range(1, 6):
        params[f"down_{i}"] = {"conv": _conv(sd, f"conv_down_block_{i}.0"),
                               "bn": _bn_params(sd, f"conv_down_block_{i}.1")}
        stats[f"down_{i}"] = {"bn": _bn_stats(sd, f"conv_down_block_{i}.1")}

    params["mid"] = {"conv": _conv(sd, "mid_block.0"),
                     "bn": _bn_params(sd, "mid_block.1")}
    stats["mid"] = {"bn": _bn_stats(sd, "mid_block.1")}

    for i in range(1, 6):
        params[f"up_{i}"] = {
            "deconv": _deconv(sd, f"transposed_conv_{i}"),
            "bn": _bn_params(sd, f"upsample_block_{i}.0"),
            "conv_block": {"conv": _conv(sd, f"conv_up_block_{i}.0"),
                           "bn": _bn_params(sd, f"conv_up_block_{i}.1")},
        }
        stats[f"up_{i}"] = {
            "bn": _bn_stats(sd, f"upsample_block_{i}.0"),
            "conv_block": {"bn": _bn_stats(sd, f"conv_up_block_{i}.1")},
        }

    head_map = [
        ("pixels_1", "conv_pixels_1", True),
        ("pixels_2", "conv_pixels_2", True),
    ]
    for flax_name, torch_name, _ in head_map:
        params[flax_name] = {"conv": _conv(sd, f"{torch_name}.0"),
                             "bn": _bn_params(sd, f"{torch_name}.1")}
        stats[flax_name] = {"bn": _bn_stats(sd, f"{torch_name}.1")}

    flat_heads = [("out_conv", "out_bn", "conv_out"),
                  ("text_conv", "text_bn", "conv_text_mask_out"),
                  ("rec_conv", "rec_bn", "conv_reconstruct")]
    for conv_name, bn_name, torch_name in flat_heads:
        params[conv_name] = _conv(sd, f"{torch_name}.0")
        params[bn_name] = _bn_params(sd, f"{torch_name}.1")
        stats[bn_name] = _bn_stats(sd, f"{torch_name}.1")

    return {"params": params, "batch_stats": stats}


def flax_to_torch_state_dict(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of torch_state_dict_to_flax: flax variables -> a reference-
    compatible state_dict (numpy tensors, reference checkpoint key names).
    Lets models trained here run in the reference installation; round-trip
    tested in tests/test_convert_parity.py."""
    params = variables["params"]
    stats = variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}

    def put_conv(torch_name, tree):
        sd[f"{torch_name}.weight"] = np.transpose(
            np.asarray(tree["kernel"], np.float32), (3, 2, 0, 1))
        sd[f"{torch_name}.bias"] = np.asarray(tree["bias"], np.float32)

    def put_deconv(torch_name, tree):
        # flax transpose_kernel kernels are (kh, kw, O, I) -> torch (I, O, kh, kw)
        sd[f"{torch_name}.weight"] = np.transpose(
            np.asarray(tree["kernel"], np.float32), (3, 2, 0, 1))
        sd[f"{torch_name}.bias"] = np.asarray(tree["bias"], np.float32)

    def put_bn(torch_name, p_bn, s_bn):
        sd[f"{torch_name}.weight"] = np.asarray(p_bn["scale"], np.float32)
        sd[f"{torch_name}.bias"] = np.asarray(p_bn["bias"], np.float32)
        sd[f"{torch_name}.running_mean"] = np.asarray(s_bn["mean"], np.float32)
        sd[f"{torch_name}.running_var"] = np.asarray(s_bn["var"], np.float32)
        sd[f"{torch_name}.num_batches_tracked"] = np.asarray(0, np.int64)

    for i in range(1, 6):
        put_conv(f"conv_down_block_{i}.0", params[f"down_{i}"]["conv"])
        put_bn(f"conv_down_block_{i}.1", params[f"down_{i}"]["bn"],
               stats[f"down_{i}"]["bn"])
    put_conv("mid_block.0", params["mid"]["conv"])
    put_bn("mid_block.1", params["mid"]["bn"], stats["mid"]["bn"])

    for i in range(1, 6):
        put_deconv(f"transposed_conv_{i}", params[f"up_{i}"]["deconv"])
        put_bn(f"upsample_block_{i}.0", params[f"up_{i}"]["bn"],
               stats[f"up_{i}"]["bn"])
        put_conv(f"conv_up_block_{i}.0", params[f"up_{i}"]["conv_block"]["conv"])
        put_bn(f"conv_up_block_{i}.1", params[f"up_{i}"]["conv_block"]["bn"],
               stats[f"up_{i}"]["conv_block"]["bn"])

    for flax_name, torch_name in (("pixels_1", "conv_pixels_1"),
                                  ("pixels_2", "conv_pixels_2")):
        put_conv(f"{torch_name}.0", params[flax_name]["conv"])
        put_bn(f"{torch_name}.1", params[flax_name]["bn"],
               stats[flax_name]["bn"])

    for conv_name, bn_name, torch_name in (("out_conv", "out_bn", "conv_out"),
                                           ("text_conv", "text_bn",
                                            "conv_text_mask_out"),
                                           ("rec_conv", "rec_bn",
                                            "conv_reconstruct")):
        put_conv(f"{torch_name}.0", params[conv_name])
        put_bn(f"{torch_name}.1", params[bn_name], stats[bn_name])

    return sd


def save_torch_checkpoint(variables: Dict[str, Any], path: str) -> None:
    """torch.save a reference-compatible checkpoint of flax variables."""
    import torch

    sd = {key: (torch.from_numpy(np.ascontiguousarray(value))
                if np.ndim(value) else torch.tensor(value))
          for key, value in flax_to_torch_state_dict(variables).items()}
    torch.save(sd, path)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch .dat/.pth checkpoint file into flax variables.

    This covers the reference's TorchModelLoader role
    (AccessMath/util/torch_model_loader.py). Its CaffeModelLoader
    counterpart lives in models/caffe_loader.py (a dependency-free
    .caffemodel parser — caffe itself isn't available in modern stacks).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_flax(sd)
