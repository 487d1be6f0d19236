"""End-to-end multi-chip CLI drive on the virtual 8-device CPU mesh: the
stage-01 binarize CLI with -mesh produces the identical artifact to the
single-device run, through a real video file and a real checkpoint."""

import numpy as np
import pytest

from lecturemath_tpu.pipeline.video import decompress_png
from lecturemath_tpu.utils.synthetic import synthetic_rgb_lecture

from test_e2e_pipeline import DB_XML


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import cv2
    import jax

    from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig,
                                                       FCNLectureNet,
                                                       init_variables)
    from lecturemath_tpu.pipeline.binarize import save_checkpoint_variables

    root = tmp_path_factory.mktemp("cli_mesh")
    (root / "db.xml").write_text(DB_XML)
    (root / "videos").mkdir()
    (root / "models").mkdir()

    rgb, _, _, _ = synthetic_rgb_lecture(seed=1, n_frames=8, height=96,
                                         width=128, n_boards=1,
                                         glyphs_per_board=4)
    writer = cv2.VideoWriter(str(root / "videos" / "synth01.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 30, (128, 96))
    for frame in rgb:
        for _ in range(30):  # 1 second per sampled frame at 1 FPS
            writer.write(frame[:, :, ::-1])
    writer.release()

    widths = "\n".join(
        f"FCN_BINARIZER_NET_{key}_{i} = {v}"
        for key, values in (("DOWN_CONV_FILTERS", (2, 3, 4, 5, 6)),
                            ("UPSAMPLE_FILTERS", (2, 3, 4, 5, 6)),
                            ("UP_CONV_FILTERS", (2, 3, 4, 5, 6)))
        for i, v in enumerate(values, 1))
    (root / "test.conf").write_text("\n".join([
        f"VIDEO_DATABASE_PATH = {root}/db.xml",
        f"VIDEO_FILES_PATH = {root}/videos",
        f"OUTPUT_PATH = {root}/output",
        "BINARIZATION_OUTPUT = tempo_binary_",
        widths,
        "FCN_BINARIZER_NET_MIDDLE_CONV_FILTERS_MIDDLE = 6",
        "FCN_BINARIZER_NET_PIXEL_FEATURES_1 = 4",
        "FCN_BINARIZER_NET_PIXEL_FEATURES_2 = 3",
        "FCN_BINARIZER_NET_PIXEL_KERNEL_SIZE = 3",
        f"BINARIZATION_FCN_LECTURENET_DIR = {root}/models",
        "BINARIZATION_FCN_LECTURENET_FILENAME = tiny.msgpack",
        "SAMPLING_FPS = 1.0",
    ]))

    from lecturemath_tpu.core.config import Config

    config = Config.from_file(str(root / "test.conf"))
    net_config = FCNConfig.from_config(config)
    model = FCNLectureNet(net_config)
    variables = init_variables(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
    save_checkpoint_variables(variables, str(root / "models" / "tiny.msgpack"))
    return root


def _run_binarize_cli(root, extra_args):
    from lecturemath_tpu.cli.binarize import main
    from lecturemath_tpu.core.artifacts import ArtifactStore

    main(["binarize", str(root / "test.conf")] + extra_args)
    store = ArtifactStore(str(root / "output" / "temporal"))
    times, indices, compressed = store.load("tempo_binary_", "synth01")
    return times, indices, decompress_png(compressed)


def test_run_pipeline_cli_mesh_and_shards(workspace):
    """Composition: express CLI with -mesh 4x2 AND sharded host tracking
    produces a summary end-to-end on the virtual device mesh."""
    import os

    from lecturemath_tpu.cli.run_pipeline import main

    conf = (workspace / "test.conf").read_text()
    (workspace / "express.conf").write_text(
        conf + "\nCC_ANALYSIS_SHARDS = 3\nCC_STABILITY_MAX_GAP = 10\n"
        "VIDEO_SEGMENTATION_DEL_EVENT_MIN_LENGTH = 2\n")

    main(["run_pipeline", str(workspace / "express.conf"),
          "-mesh", "4x2"])
    summary_dir = workspace / "output" / "summaries" / "SynthDB_synth01"
    assert (summary_dir / "segments.xml").exists()
    assert os.listdir(summary_dir / "keyframes")


def test_cli_mesh_matches_single_device(workspace):
    base_times, base_indices, base_frames = _run_binarize_cli(workspace, [])
    assert len(base_frames) == 8

    mesh_times, mesh_indices, mesh_frames = _run_binarize_cli(
        workspace, ["-mesh", "4x2"])
    assert mesh_times == base_times and mesh_indices == base_indices
    for a, b in zip(base_frames, mesh_frames):
        np.testing.assert_array_equal(a, b)


def test_binarize_cli_upload_format(workspace):
    """UPLOAD_FORMAT=yuv420 through the binarize CLI: runs end-to-end and
    stays within chroma-rounding distance of the rgb artifact."""
    import numpy as np

    from lecturemath_tpu.pipeline.video import decompress_png

    times_rgb, idx_rgb, frames_rgb = _run_binarize_cli(workspace, [])

    conf = (workspace / "test.conf").read_text()
    (workspace / "yuv.conf").write_text(conf + "\nUPLOAD_FORMAT = yuv420\n")
    from lecturemath_tpu.cli.binarize import main
    from lecturemath_tpu.core.artifacts import ArtifactStore

    main(["binarize", str(workspace / "yuv.conf")])
    store = ArtifactStore(str(workspace / "output" / "temporal"))
    times_yuv, idx_yuv, png_yuv = store.load("tempo_binary_", "synth01")

    assert idx_yuv == idx_rgb and times_yuv == times_rgb
    mism = np.mean([np.mean(a != b) for a, b in
                    zip(frames_rgb, decompress_png(png_yuv))])
    assert mism < 0.02, mism
