"""Behavioral-oracle access to the reference implementation.

Runs the reference's own Python (from /root/reference, read-only) against a
temp dir that holds a freshly compiled accessmath_lib.so (the shipped .so is
an invalid ELF). Nothing is copied into this repo; the oracle exists purely
so parity tests can diff our outputs against the reference's actual behavior.
"""

import os
import subprocess
import sys

ORACLE_DIR = "/tmp/lm_oracle"
REFERENCE_DIR = "/root/reference/ACCESS2021_release"

_ready = False


def ensure_oracle():
    """Compile the C kernel + symlink the reference packages; import-ready."""
    global _ready
    if _ready:
        return
    os.makedirs(ORACLE_DIR, exist_ok=True)
    so_path = os.path.join(ORACLE_DIR, "accessmath_lib.so")
    if not os.path.exists(so_path):
        subprocess.run(
            ["gcc", "-m64", "-shared", "-fPIC",
             os.path.join(REFERENCE_DIR, "accessmath_lib.c"), "-o", so_path],
            check=True)
    for pkg in ("AccessMath", "AM_CommonTools"):
        link = os.path.join(ORACLE_DIR, pkg)
        if not os.path.exists(link):
            os.symlink(os.path.join(REFERENCE_DIR, pkg), link)

    # the reference loads the .so from CWD and uses names removed in numpy 2
    os.chdir(ORACLE_DIR)
    if ORACLE_DIR not in sys.path:
        sys.path.insert(0, ORACLE_DIR)
    import numpy as np
    if not hasattr(np, "bool"):
        np.bool = bool  # reference keyframe_extractor.py uses np.bool

    # shapely isn't in the image; the reference only needs Polygon as a
    # container for annotation polygons in the paths we exercise
    if "shapely" not in sys.modules:
        import types

        class _Polygon:
            def __init__(self, points):
                self.points = points

            def __str__(self):
                return f"Polygon({len(self.points)} pts)"

        class _Point:
            def __init__(self, *args):
                self.coords = args

        geometry = types.ModuleType("shapely.geometry")
        geometry.Polygon = _Polygon
        geometry.Point = _Point
        point_mod = types.ModuleType("shapely.geometry.point")
        point_mod.Point = _Point
        geometry.point = point_mod
        shapely = types.ModuleType("shapely")
        shapely.geometry = geometry
        sys.modules["shapely"] = shapely
        sys.modules["shapely.geometry"] = geometry
        sys.modules["shapely.geometry.point"] = point_mod

    _ready = True


def stub_torchvision():
    """Minimal torchvision.transforms.functional stand-in — the image lacks
    torchvision, and the reference model file only touches to_tensor /
    normalize at inference (FCN_lecturenet.py:607-618)."""
    import sys
    import types

    import numpy as np
    import torch

    if "torchvision" in sys.modules:
        return

    functional = types.ModuleType("torchvision.transforms.functional")

    def to_tensor(pil_image):
        arr = np.asarray(pil_image, dtype=np.float32) / 255.0
        return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    def normalize(tensor, mean, std):
        mean_t = torch.tensor(mean).view(-1, 1, 1)
        std_t = torch.tensor(std).view(-1, 1, 1)
        return (tensor - mean_t) / std_t

    functional.to_tensor = to_tensor
    functional.normalize = normalize

    transforms = types.ModuleType("torchvision.transforms")
    transforms.functional = functional
    torchvision = types.ModuleType("torchvision")
    torchvision.transforms = transforms

    sys.modules["torchvision"] = torchvision
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def oracle_lecturenet_class():
    """The reference torch FCN_LectureNet class, importable."""
    ensure_oracle()
    stub_torchvision()
    from AccessMath.lecturenet_v1.FCN_lecturenet import FCN_LectureNet
    return FCN_LectureNet


def oracle_estimator(width, height, min_recall, min_precision, max_gap):
    ensure_oracle()
    from AccessMath.preprocessing.content.cc_stability_estimator import \
        CCStabilityEstimator
    return CCStabilityEstimator(width, height, min_recall, min_precision, max_gap)


def oracle_video_segmenter():
    ensure_oracle()
    import matplotlib
    matplotlib.use("Agg")
    from AccessMath.preprocessing.content.video_segmenter import VideoSegmenter
    return VideoSegmenter


def oracle_keyframe_extractor():
    ensure_oracle()
    from AccessMath.preprocessing.content.keyframe_extractor import \
        KeyframeExtractor
    return KeyframeExtractor


def oracle_space_time_struct(*args, **kwargs):
    ensure_oracle()
    from AccessMath.data.space_time_struct import SpaceTimeStruct
    return SpaceTimeStruct(*args, **kwargs)
