"""Express pipeline CLI: all five stages in one pass per lecture, no
inter-stage PNG pickle relay.

Usage: python -m lecturemath_tpu.cli.run_pipeline <config> [-l lecture]
[-d dataset] [-shard i/n] [-save 1] [-mesh DxM]
"""

import sys

from ..pipeline.binarize import Binarizer
from ..pipeline.driver import PipelineDriver, usage_check
from ..pipeline.express import run_lecture
from .binarize import resolve_mesh


def main(argv=None):
    argv = sys.argv if argv is None else argv
    if not usage_check(argv):
        return

    from ..core.backend_probe import ensure_backend

    ensure_backend()
    driver = PipelineDriver.from_config_path(argv[1], argv[2:], None, None)
    from ..parallel.mesh import shutdown_distributed

    # finally: a host that dies mid-run must still join the shutdown
    # barrier, or its peers trip the ~30 s shutdown deadline
    try:
        binarizer = Binarizer.from_config(
            driver.config, mesh=resolve_mesh(driver.params, driver.config))
        save_artifacts = str(driver.params.get("save", "0")) == "1"

        for lecture in driver.iter_lectures():
            with driver.timer.measure(lecture.title):
                indices, times, keyframes = run_lecture(
                    driver, lecture, binarizer,
                    save_artifacts=save_artifacts)
            print(f"{lecture.title}: {len(keyframes)} keyframes in "
                  f"{driver.timer.totals[lecture.title]:.2f}s")
    finally:
        shutdown_distributed()
    print("Finished")


if __name__ == "__main__":
    main()
