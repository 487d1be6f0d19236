"""Stage 02 CLI — unique-CC tracking over binarized frames.

Usage: python -m lecturemath_tpu.cli.cc_analysis <config> [options]
(reference equivalent: pre_ST3D_v3.0_02_cc_analaysis.py)
"""

import sys

from ..pipeline.driver import PipelineDriver, usage_check
from ..pipeline.stages import stage02_cc_analysis


def main(argv=None):
    argv = sys.argv if argv is None else argv
    if not usage_check(argv):
        return

    driver = PipelineDriver.from_config_path(argv[1], argv[2:],
                                             "BINARIZATION_OUTPUT",
                                             "CC_STABILITY_OUTPUT")
    if driver.config.get_bool("CC_ANALYSIS_DEVICE_LABELING", False):
        from ..core.backend_probe import ensure_backend

        ensure_backend()    # this mode touches the device
    driver.run(stage02_cc_analysis)
    print("Finished")


if __name__ == "__main__":
    main()
