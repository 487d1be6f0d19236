"""Text-detector pretrain evaluation CLI: binarize pretrain eval images with
the model and match predicted CCs to GT text-mask CCs at IOU thresholds.

Usage: python -m lecturemath_tpu.cli.eval_text_detector <config> <model>
(reference equivalent: lecturenet_eval_pretrain_text_detector.py)
"""

import os
import sys

import numpy as np

from ..core.config import Config
from ..eval.text_detector_eval import IOU_THRESHOLDS, cc_iou_matching
from ..pipeline.binarize import Binarizer
from ..train.dataset import find_image_mask_pairs


def main(argv=None):
    import cv2
    import jax.numpy as jnp

    argv = sys.argv if argv is None else argv
    if len(argv) < 3:
        print(f"Usage: python {argv[0]} config model")
        return

    from ..core.backend_probe import ensure_backend

    ensure_backend()

    config = Config.from_file(argv[1])
    images, masks = find_image_mask_pairs(
        config.get_str("FCN_BINARIZER_PRETRAIN_EVAL_IMAGES_DIR"),
        config.get_str("FCN_BINARIZER_PRETRAIN_EVAL_MASKS_DIR"))
    threshold = config.get_int("FCN_BINARIZER_PRETRAIN_EVAL_BIN_TRESHOLD", 128)

    model_dir, model_file = os.path.split(argv[2])
    config.set("BINARIZATION_FCN_LECTURENET_DIR", model_dir or ".")
    config.set("BINARIZATION_FCN_LECTURENET_FILENAME", model_file)
    binarizer = Binarizer.from_config(config, threshold=threshold)

    rollup = {iou_t: {"recall": [], "precision": [], "f1": []}
              for iou_t in IOU_THRESHOLDS}
    pixel_rollup = {"recall": [], "precision": [], "f1": []}

    for img_path, mask_path in zip(images, masks):
        print(f"Processing: {img_path}", flush=True)
        image = cv2.imread(img_path)[:, :, ::-1]
        gt_mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)

        binary, _, _ = binarizer._binarize_fn(jnp.asarray(image[None]))
        pred_ink = 255 - np.asarray(binary[0])  # model output: ink = 0

        per_threshold, pixel = cc_iou_matching(pred_ink, gt_mask)
        for iou_t in IOU_THRESHOLDS:
            for key in ("recall", "precision", "f1"):
                rollup[iou_t][key].append(per_threshold[iou_t][key])
        for key in pixel_rollup:
            pixel_rollup[key].append(pixel[key])

    print("\nIOU\tRec.\tPrec.\tF-1")
    for iou_t in IOU_THRESHOLDS:
        print(f"{iou_t:.2f}\t"
              f"{np.mean(rollup[iou_t]['recall']) * 100:.2f}\t"
              f"{np.mean(rollup[iou_t]['precision']) * 100:.2f}\t"
              f"{np.mean(rollup[iou_t]['f1']) * 100:.2f}")
    print("\nPixel\tRec.\tPrec.\tF-1")
    print(f"\t{np.mean(pixel_rollup['recall']) * 100:.2f}\t"
          f"{np.mean(pixel_rollup['precision']) * 100:.2f}\t"
          f"{np.mean(pixel_rollup['f1']) * 100:.2f}")


if __name__ == "__main__":
    main()
