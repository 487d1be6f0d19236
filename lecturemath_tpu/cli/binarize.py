"""Stage 01 CLI — batched TPU binarization of lecture videos.

Usage: python -m lecturemath_tpu.cli.binarize <config> [-l lecture]
[-d dataset] [-mesh DxM]
(reference equivalent: pre_ST3D_v3.0_01_binarize.py; the reference was
single-GPU batch-1, pre_ST3D_v3.0_01_binarize.py:31-37 — ``-mesh`` / the
TPU_MESH config key shard the frame axis across chips instead.)
"""

import sys

from ..pipeline.binarize import Binarizer
from ..pipeline.driver import PipelineDriver, usage_check
from ..pipeline.stages import stage01_binarize


def resolve_mesh(params, config):
    """Build the device mesh a CLI run asked for (-mesh / TPU_MESH), or
    None for the default single-device path. Joins a multi-process mesh
    first when the LM_COORDINATOR env contract is set (multi-host pods:
    run the same CLI on every host with its own LM_PROCESS_ID)."""
    from ..parallel.mesh import (initialize_distributed_from_env, make_mesh,
                                 mesh_spec_from, warmup_collectives)

    initialize_distributed_from_env()
    spec = mesh_spec_from(params, config)
    if spec is None:
        return None
    mesh = make_mesh(spec)
    warmup_collectives(mesh)  # pre-create cross-process communicators
    return mesh


def main(argv=None):
    argv = sys.argv if argv is None else argv
    if not usage_check(argv):
        return

    from ..core.backend_probe import ensure_backend

    ensure_backend()
    driver = PipelineDriver.from_config_path(argv[1], argv[2:], None,
                                             "BINARIZATION_OUTPUT")
    from ..parallel.mesh import shutdown_distributed

    # finally: a host that dies mid-run must still join the shutdown
    # barrier, or its peers trip the ~30 s shutdown deadline
    try:
        binarizer = Binarizer.from_config(
            driver.config, mesh=resolve_mesh(driver.params, driver.config))
        driver.run(lambda d, lecture, inputs:
                   stage01_binarize(d, lecture, inputs, binarizer))
    finally:
        shutdown_distributed()
    print("Finished")


if __name__ == "__main__":
    main()
