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
    return np.asarray(tensor, dtype=np.float32)


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


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch .dat/.pth checkpoint file into flax variables.

    This covers the reference's TorchModelLoader role
    (AccessMath/util/torch_model_loader.py). Its CaffeModelLoader
    counterpart is not supported: caffe isn't available in modern stacks
    and no caffe checkpoints ship with the reference release.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_flax(sd)
