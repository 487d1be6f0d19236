"""The trainer CLI mains end-to-end (the library Trainer has deep parity
coverage; this drives the ENTRY POINT: backend probe, pair discovery,
run_phase wiring, checkpoint save, clean shutdown path)."""

import os

import cv2
import numpy as np
import pytest

DB_XML = """<AccessMath><DataBase><Name>TRDB</Name>
<OutputPaths><Temporal>temporal</Temporal><Images>images</Images>
<Videos>videos</Videos><Annotations>annotations</Annotations>
<Summaries>summaries</Summaries></OutputPaths>
<Datasets><Training><LectureTitle>tr01</LectureTitle></Training></Datasets>
<Lectures><Lecture><Id>tr01</Id><Title>tr01</Title><Parameters></Parameters>
<Videos><Main><Video><Path>tr01.mp4</Path></Video></Main></Videos>
</Lecture></Lectures></DataBase></AccessMath>
"""

TINY_WIDTHS = "\n".join(
    f"FCN_BINARIZER_NET_{key}_{i} = {v}"
    for key, values in (("DOWN_CONV_FILTERS", (2, 3, 4, 5, 6)),
                        ("UPSAMPLE_FILTERS", (2, 3, 4, 5, 6)),
                        ("UP_CONV_FILTERS", (2, 3, 4, 5, 6)))
    for i, v in enumerate(values, 1))


@pytest.fixture()
def train_workspace(tmp_path):
    annot = tmp_path / "output" / "annotations" / "TRDB_tr01"
    (annot / "keyframes").mkdir(parents=True)
    (annot / "binary").mkdir(parents=True)
    rng = np.random.default_rng(4)
    for k in range(3):
        rgb = np.full((64, 80, 3), 225, np.uint8)
        rgb[20:40, 10:60] = rng.integers(0, 60, (20, 50, 3), np.uint8)
        binary = np.full((64, 80), 255, np.uint8)
        binary[20:40, 10:60] = 0    # ink=0, the GT convention
        cv2.imwrite(str(annot / "keyframes" / f"{k}.png"), rgb)
        cv2.imwrite(str(annot / "binary" / f"{k}.png"), binary)

    (tmp_path / "db.xml").write_text(DB_XML)
    conf = tmp_path / "train.conf"
    conf.write_text("\n".join([
        f"VIDEO_DATABASE_PATH = {tmp_path}/db.xml",
        f"OUTPUT_PATH = {tmp_path}/output",
        TINY_WIDTHS,
        "FCN_BINARIZER_NET_MIDDLE_CONV_FILTERS_MIDDLE = 6",
        "FCN_BINARIZER_NET_PIXEL_FEATURES_1 = 4",
        "FCN_BINARIZER_NET_PIXEL_FEATURES_2 = 3",
        "FCN_BINARIZER_NET_PIXEL_KERNEL_SIZE = 3",
        "FCN_BINARIZER_TRAIN_EPOCHS = 2",
        "FCN_BINARIZER_TRAIN_BATCH_SIZE = 2",
        "FCN_BINARIZER_TRAIN_LEARNING_RATE = 0.01",
        "FCN_BINARIZER_TRAIN_CROP_SIZE = (32, 32)",
        "FCN_BINARIZER_TRAIN_CROP_MIN_FOREGROUND = 0.0",
        f"FCN_BINARIZER_TRAIN_OUTPUT = {tmp_path}/models/bin_cli.msgpack",
    ]))
    return tmp_path


def test_train_binarizer_cli_end_to_end(train_workspace, capsys):
    from lecturemath_tpu.cli.train_binarizer import main

    main(["prog", str(train_workspace / "train.conf"), "training"])
    out = capsys.readouterr().out
    assert "Saved:" in out
    saved = [line for line in out.splitlines()
             if line.startswith("Saved:")][0].split(": ", 1)[1]
    assert os.path.exists(saved)

    # the checkpoint loads back into a Binarizer (the serving contract)
    from lecturemath_tpu.core.config import Config
    from lecturemath_tpu.pipeline.binarize import Binarizer

    config = Config.from_file(str(train_workspace / "train.conf"))
    config.set("BINARIZATION_FCN_LECTURENET_DIR", os.path.dirname(saved))
    config.set("BINARIZATION_FCN_LECTURENET_FILENAME",
               os.path.basename(saved))
    binarizer = Binarizer.from_config(config)
    frame = np.full((1, 48, 64, 3), 220, np.uint8)
    assert binarizer.binarize_frames(frame).shape == (1, 48, 64)


@pytest.fixture()
def pretrain_workspace(tmp_path):
    img_dir = tmp_path / "text_imgs"
    mask_dir = tmp_path / "text_masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.default_rng(7)
    for k in range(3):
        rgb = np.full((64, 80, 3), 210, np.uint8)
        rgb[10:30, 20:60] = rng.integers(0, 80, (20, 40, 3), np.uint8)
        mask = np.zeros((64, 80), np.uint8)
        mask[10:30, 20:60] = 255
        cv2.imwrite(str(img_dir / f"{k}.png"), rgb)
        cv2.imwrite(str(mask_dir / f"{k}.png"), mask)

    conf = tmp_path / "pretrain.conf"
    conf.write_text("\n".join([
        TINY_WIDTHS,
        "FCN_BINARIZER_NET_MIDDLE_CONV_FILTERS_MIDDLE = 6",
        "FCN_BINARIZER_NET_PIXEL_FEATURES_1 = 4",
        "FCN_BINARIZER_NET_PIXEL_FEATURES_2 = 3",
        "FCN_BINARIZER_NET_PIXEL_KERNEL_SIZE = 3",
        f"OUTPUT_PATH = {tmp_path}/output",
        f"FCN_BINARIZER_PRETRAIN_REC_IMAGES_DIR = {img_dir}",
        f"FCN_BINARIZER_PRETRAIN_IMAGES_DIR = {img_dir}",
        f"FCN_BINARIZER_PRETRAIN_MASKS_DIR = {mask_dir}",
        "FCN_BINARIZER_PRETRAIN_BATCH_SIZE = 2",
        "FCN_BINARIZER_PRETRAIN_REC_EPOCHS = 1",
        "FCN_BINARIZER_PRETRAIN_EPOCHS = 1",
        "FCN_BINARIZER_PRETRAIN_REC_LEARNING_RATE = 0.01",
        "FCN_BINARIZER_PRETRAIN_LEARNING_RATE = 0.01",
        "FCN_BINARIZER_TRAIN_CROP_SIZE = (32, 32)",
        "FCN_BINARIZER_TRAIN_CROP_MIN_FOREGROUND = 0.0",
        f"FCN_BINARIZER_PRETRAIN_RECONSTRUCTION_OUTPUT = {tmp_path}/rec.msgpack",
        f"FCN_BINARIZER_PRETRAIN_TEXT_OUTPUT = {tmp_path}/text.msgpack",
        "FCN_BINARIZER_PRETRAIN_USE_RECONSTRUCTION_OUTPUT = 1",
    ]))
    return tmp_path


def test_pretrain_cli_chain(pretrain_workspace, capsys):
    """Med-PT then TD-PT through the CLI mains, the reference curriculum's
    first two stages (lecturenet_train_00/01): the reconstruction CLI saves
    a checkpoint and the text-detector CLI warm-starts from it."""
    from lecturemath_tpu.cli.train_reconstruction import main as rec_main
    from lecturemath_tpu.cli.train_text_detector import main as text_main

    conf = str(pretrain_workspace / "pretrain.conf")
    rec_main(["prog", conf])
    out = capsys.readouterr().out
    assert "Training reconstruction on 3 images" in out
    rec_path = pretrain_workspace / "rec.msgpack"
    assert rec_path.exists()

    text_main(["prog", conf])
    out = capsys.readouterr().out
    assert "Training text detector on 3 image/mask pairs" in out
    assert f"warm start from {rec_path} (heads reset)" in out
    assert (pretrain_workspace / "text.msgpack").exists()


def test_missing_warm_start_raises(pretrain_workspace):
    """A typo'd warm-start path must not silently train from scratch
    (warm_started also gates freeze-BN semantics)."""
    from lecturemath_tpu.cli.train_text_detector import main as text_main

    conf = pretrain_workspace / "pretrain.conf"
    conf.write_text(conf.read_text().replace(
        "rec.msgpack", "typo.msgpack"))
    with pytest.raises(FileNotFoundError, match="warm-start checkpoint"):
        text_main(["prog", str(conf)])


def test_train_binarizer_cli_bad_dataset(train_workspace):
    from lecturemath_tpu.cli.train_binarizer import main

    with pytest.raises(ValueError, match="invalid dataset name"):
        main(["prog", str(train_workspace / "train.conf"), "nope"])
