"""Stage 01 CLI — batched TPU binarization of lecture videos.

Usage: python -m lecturemath_tpu.cli.binarize <config> [-l lecture] [-d dataset]
(reference equivalent: pre_ST3D_v3.0_01_binarize.py)
"""

import sys

from ..pipeline.binarize import Binarizer
from ..pipeline.driver import PipelineDriver, usage_check
from ..pipeline.stages import stage01_binarize


def main(argv=None):
    argv = sys.argv if argv is None else argv
    if not usage_check(argv):
        return

    driver = PipelineDriver.from_config_path(argv[1], argv[2:], None,
                                             "BINARIZATION_OUTPUT")
    binarizer = Binarizer.from_config(driver.config)
    driver.run(lambda d, lecture, inputs:
               stage01_binarize(d, lecture, inputs, binarizer))
    print("Finished")


if __name__ == "__main__":
    main()
