"""Smoke tool: binarize a single image with a model checkpoint and write
the binary / text-mask / reconstruction outputs next to it.

Usage: python -m lecturemath_tpu.cli.binarize_image config model image [out_prefix]
(reference equivalent: test_FCN_binarizer.py)
"""

import os
import sys

import numpy as np


def main(argv=None):
    import cv2
    import jax.numpy as jnp

    from ..core.backend_probe import ensure_backend
    from ..core.config import Config
    from ..pipeline.binarize import Binarizer

    argv = sys.argv if argv is None else argv
    if len(argv) < 4:
        print(f"Usage: python {argv[0]} config model image [out_prefix]")
        return

    ensure_backend()
    config = Config.from_file(argv[1])
    model_dir, model_file = os.path.split(argv[2])
    config.set("BINARIZATION_FCN_LECTURENET_DIR", model_dir or ".")
    config.set("BINARIZATION_FCN_LECTURENET_FILENAME", model_file)
    binarizer = Binarizer.from_config(config)

    image = cv2.imread(argv[3])
    rgb = image[:, :, ::-1]
    binary, text_mask, rec = binarizer._binarize_fn(jnp.asarray(rgb[None]))

    prefix = argv[4] if len(argv) > 4 else os.path.splitext(argv[3])[0]
    cv2.imwrite(prefix + "_BIN.png", np.asarray(binary[0]))
    cv2.imwrite(prefix + "_text.png", np.asarray(text_mask[0]))
    cv2.imwrite(prefix + "_bg.png", np.asarray(rec[0])[:, :, ::-1])
    print(f"Wrote {prefix}_BIN.png / _text.png / _bg.png")


if __name__ == "__main__":
    main()
