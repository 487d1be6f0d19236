"""End-to-end multi-chip CLI drive on the virtual 8-device CPU mesh: the
stage-01 binarize CLI with -mesh produces the identical artifact to the
single-device run, through a real video file and a real checkpoint."""

import numpy as np
import pytest

from lecturemath_tpu.pipeline.video import decompress_png


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from cli_workspace import build_cli_workspace

    return build_cli_workspace(tmp_path_factory.mktemp("cli_mesh"),
                               name="ws")


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
