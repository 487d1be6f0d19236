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
    binarizer = None
    try:
        mesh = resolve_mesh(driver.params, driver.config)
        recycle_mb = driver.config.get_float("DEVICE_WORKER_RECYCLE_MB", 0.0)
        if recycle_mb > 0 and mesh is None:
            # recycled child device process (pipeline/device_worker.py):
            # contains the axon tunnel's per-upload native-memory retention
            # over a whole multi-lecture run; shared across lectures so a
            # healthy child keeps its warm compile between them
            from ..pipeline.device_worker import WorkerBinarizer

            binarizer = WorkerBinarizer.from_config(driver.config)
        else:
            binarizer = Binarizer.from_config(driver.config, mesh=mesh)
        save_artifacts = str(driver.params.get("save", "0")) == "1"

        for lecture in driver.iter_lectures():
            with driver.timer.measure(lecture.title):
                indices, times, keyframes = run_lecture(
                    driver, lecture, binarizer,
                    save_artifacts=save_artifacts)
            print(f"{lecture.title}: {len(keyframes)} keyframes in "
                  f"{driver.timer.totals[lecture.title]:.2f}s")
    finally:
        if binarizer is not None and hasattr(binarizer, "close"):
            binarizer.close()
        shutdown_distributed()
    print("Finished")


if __name__ == "__main__":
    main()
