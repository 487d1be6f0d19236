"""Med-PT: pretrain the reconstruction branch against median-blurred targets.

Usage: python -m lecturemath_tpu.cli.train_reconstruction <config> [-mesh DxM]
(reference equivalent: lecturenet_train_00_pretrain_reconstruction.py;
-mesh / TPU_MESH train dp x tp sharded over a device mesh)
"""

import sys

from ..core.config import Config, parse_cli_overrides
from ..parallel.mesh import mesh_spec_from
from ..train.dataset import LectureNetDataset, find_images
from ..train.trainer import run_phase


def main(argv=None):
    argv = sys.argv if argv is None else argv
    if len(argv) < 2:
        print(f"Usage: python {argv[0]} config")
        return

    from ..core.backend_probe import ensure_backend

    ensure_backend()
    config = Config.from_file(argv[1])
    images = find_images(config.get_str("FCN_BINARIZER_PRETRAIN_REC_IMAGES_DIR"))
    print(f"Training reconstruction on {len(images)} images")

    dataset = LectureNetDataset.from_config(
        config, images, None, reconstruction_mode=True,
        reconstruct_median=config.get_bool("FCN_BINARIZER_PRETRAIN_REC_MEDIAN",
                                           True))
    if config.get_bool("FCN_BINARIZER_PRETRAIN_PRELOAD_IMAGES", False):
        dataset.preload(verbose=True)

    from ..parallel.mesh import shutdown_distributed

    # finally: a host that dies mid-phase must still join the
    # shutdown barrier, or its peers trip the ~30 s deadline
    try:
        out = run_phase(config, "reconstruction", dataset,
                        mesh_spec=mesh_spec_from(parse_cli_overrides(argv[2:]),
                                                 config))
    finally:
        shutdown_distributed()
    print(f"Saved: {out}")


if __name__ == "__main__":
    main()
