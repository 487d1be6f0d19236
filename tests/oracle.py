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

    # shapely isn't in the image. The stub Polygon provides the area /
    # intersection surface VideoObjectLocation uses, implemented with an
    # exact convex-convex algorithm (vertex containment + edge crossings
    # + angular sort) that is INDEPENDENT of the package's
    # Sutherland-Hodgman clipping, so exporter parity tests are honest.
    if "shapely" not in sys.modules:
        import types

        import numpy as np

        def _shoelace(pts):
            x, y = pts[:, 0], pts[:, 1]
            return 0.5 * abs(np.dot(x, np.roll(y, -1)) -
                             np.dot(y, np.roll(x, -1)))

        def _inside_convex(pt, poly):
            # all cross products same sign for a convex polygon boundary
            a = poly
            b = np.roll(poly, -1, axis=0)
            cross = ((b[:, 0] - a[:, 0]) * (pt[1] - a[:, 1]) -
                     (b[:, 1] - a[:, 1]) * (pt[0] - a[:, 0]))
            return (cross >= -1e-9).all() or (cross <= 1e-9).all()

        def _seg_cross(p1, p2, q1, q2):
            r = p2 - p1
            s = q2 - q1
            denom = r[0] * s[1] - r[1] * s[0]
            if abs(denom) < 1e-12:
                return None
            t = ((q1[0] - p1[0]) * s[1] - (q1[1] - p1[1]) * s[0]) / denom
            u = ((q1[0] - p1[0]) * r[1] - (q1[1] - p1[1]) * r[0]) / denom
            if -1e-9 <= t <= 1 + 1e-9 and -1e-9 <= u <= 1 + 1e-9:
                return p1 + t * r
            return None

        def _convex_intersection_area(p, q):
            pts = [v for v in p if _inside_convex(v, q)]
            pts += [v for v in q if _inside_convex(v, p)]
            for i in range(len(p)):
                for j in range(len(q)):
                    hit = _seg_cross(p[i], p[(i + 1) % len(p)],
                                     q[j], q[(j + 1) % len(q)])
                    if hit is not None:
                        pts.append(hit)
            if len(pts) < 3:
                return 0.0
            pts = np.array(pts)
            center = pts.mean(axis=0)
            order = np.argsort(np.arctan2(pts[:, 1] - center[1],
                                          pts[:, 0] - center[0]))
            return _shoelace(pts[order])

        class _Polygon:
            def __init__(self, points):
                self.points = np.asarray(points, dtype=np.float64)

            def __str__(self):
                return f"Polygon({len(self.points)} pts)"

            @property
            def area(self):
                return _shoelace(self.points)

            def intersection(self, other):
                area = _convex_intersection_area(self.points, other.points)
                result = types.SimpleNamespace()
                result.area = area
                return result

            def intersects(self, other):
                return (_convex_intersection_area(self.points,
                                                  other.points) > 1e-9)

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


def oracle_text_annotation_exporter():
    ensure_oracle()
    from AccessMath.annotation.text_annotation_exporter import \
        TextAnnotationExporter
    return TextAnnotationExporter


def oracle_text_detection_evaluator():
    ensure_oracle()
    from AccessMath.evaluation.text_detection_evaluator import \
        TextDetectionEvaluator
    return TextDetectionEvaluator


def oracle_lecture_annotation_class():
    ensure_oracle()
    from AccessMath.annotation.lecture_annotation import LectureAnnotation
    return LectureAnnotation
