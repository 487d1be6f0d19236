"""The data-prep / smoke-tool CLI entry points end-to-end
(reference scripts: lecturenet_data_00_prepare_binary_text_masks.py,
TEXT_ICDAR2017_COCOText_prepare.py, TEXT_dataset_validate_files.py,
test_FCN_binarizer.py). The library paths below them have parity
coverage; these drive the mains: argv parsing, file discovery, outputs."""

import json
import os

import cv2
import numpy as np


def _write_jpg(path, height=300, width=320, value=200):
    image = np.full((height, width, 3), value, np.uint8)
    cv2.imwrite(str(path), image)


def test_prepare_text_masks_cli(tmp_path, capsys):
    from lecturemath_tpu.cli.prepare_text_masks import main

    img_dir = tmp_path / "imgs"
    out_dir = tmp_path / "masks"
    img_dir.mkdir()
    _write_jpg(img_dir / "gt_0.jpg")
    _write_jpg(img_dir / "gt_1.jpg", height=128, width=128)  # below 256px

    # LSVT/ArT-style GT: {img_id: [{"points": [[x, y], ...]}, ...]}
    gt = {
        "gt_0": [{"points": [[10, 10], [60, 10], [60, 40], [10, 40]]},
                 {"points": [[100, 100], [150, 100], [125, 140]]}],
        "gt_1": [{"points": [[5, 5], [20, 5], [20, 20], [5, 20]]}],
        "gt_missing": [{"points": [[0, 0], [5, 0], [5, 5]]}],
    }
    (tmp_path / "gt.json").write_text(json.dumps(gt))

    main(["prog", str(tmp_path / "gt.json"), str(img_dir), str(out_dir)])
    out = capsys.readouterr().out
    assert "3 annotated images" in out
    assert "missing image: gt_missing" in out
    assert "1 images below 256px" in out

    mask = cv2.imread(str(out_dir / "gt_0.png"), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (300, 320)
    expected = np.zeros((300, 320), np.uint8)
    cv2.fillPoly(expected, [np.array(gt["gt_0"][0]["points"], np.int32)],
                 (255,))
    cv2.fillPoly(expected, [np.array(gt["gt_0"][1]["points"], np.int32)],
                 (255,))
    assert np.array_equal(mask, expected)
    assert not os.path.exists(out_dir / "gt_missing.png")


def test_prepare_cocotext_cli(tmp_path, capsys):
    from lecturemath_tpu.cli.prepare_cocotext import main

    in_dir = tmp_path / "coco"
    in_dir.mkdir()
    # COCO-Text schema: imgs (set per image), imgToAnns, anns (flat polygon)
    gt = {
        "imgs": {"7": {"set": "train"}, "8": {"set": "val"},
                 "9": {"set": "nonsense"}},
        "imgToAnns": {"7": [1, 2], "8": [3], "9": [4]},
        "anns": {
            "1": {"polygon": [10.4, 10.6, 80.2, 10.0, 80.0, 50.0, 10.0, 50.0]},
            "2": {"polygon": [100, 20, 140, 20, 120, 60]},
            "3": {"polygon": [5, 5, 25, 5, 25, 25, 5, 25]},
            "4": {"polygon": [0, 0, 5, 0, 5, 5]},
        },
    }
    (tmp_path / "coco.json").write_text(json.dumps(gt))
    _write_jpg(in_dir / "COCO_train2014_000000000007.jpg")
    _write_jpg(in_dir / "COCO_train2014_000000000008.jpg")
    # image 9 exists but its set is not a known split -> skipped entirely

    dirs = {name: tmp_path / name for name in
            ("tr_img", "tr_mask", "va_img", "va_mask", "te_img", "te_mask")}
    main(["prog", str(in_dir), str(tmp_path / "coco.json"),
          str(dirs["tr_img"]), str(dirs["tr_mask"]),
          str(dirs["va_img"]), str(dirs["va_mask"]),
          str(dirs["te_img"]), str(dirs["te_mask"])])
    out = capsys.readouterr().out
    assert "train: 1 images" in out and "val: 1 images" in out

    stem7 = "COCO_train2014_000000000007"
    stem8 = "COCO_train2014_000000000008"
    assert os.path.exists(dirs["tr_img"] / (stem7 + ".jpg"))
    assert os.path.exists(dirs["va_img"] / (stem8 + ".jpg"))
    assert not any(os.scandir(dirs["te_img"]))

    mask = cv2.imread(str(dirs["tr_mask"] / (stem7 + ".png")),
                      cv2.IMREAD_GRAYSCALE)
    expected = np.zeros((300, 320), np.uint8)
    poly1 = np.array(gt["anns"]["1"]["polygon"]).round(0).astype(np.int32)
    poly2 = np.array(gt["anns"]["2"]["polygon"]).round(0).astype(np.int32)
    cv2.fillPoly(expected, [poly1.reshape(-1, 2)], (255,))
    cv2.fillPoly(expected, [poly2.reshape(-1, 2)], (255,))
    assert np.array_equal(mask, expected)


def test_validate_dataset_cli(tmp_path, capsys):
    from lecturemath_tpu.cli.validate_dataset import main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    _write_jpg(img_dir / "good.jpg")
    _write_jpg(img_dir / "small.png", height=64, width=500)
    (img_dir / "broken.jpg").write_bytes(b"not an image")
    (img_dir / "notes.txt").write_text("ignored")

    main(["prog", str(img_dir)])
    out = capsys.readouterr().out
    assert "UNLOADABLE: broken.jpg" in out
    assert "TOO SMALL (64x500): small.png" in out
    assert "1 unloadable, 1 below 256px" in out

    # custom threshold: nothing is small at 32px
    main(["prog", str(img_dir), "32"])
    out = capsys.readouterr().out
    assert "1 unloadable, 0 below 32px" in out


def test_binarize_image_cli(tmp_path, capsys):
    from cli_workspace import build_cli_workspace
    from lecturemath_tpu.cli.binarize_image import main

    root = build_cli_workspace(tmp_path, name="binimg", n_frames=1)
    image_path = tmp_path / "board.png"
    rgb = np.full((64, 96, 3), 230, np.uint8)
    rgb[20:40, 30:70] = 20
    cv2.imwrite(str(image_path), rgb)

    prefix = str(tmp_path / "out")
    main(["prog", str(root / "test.conf"),
          str(root / "models" / "tiny.msgpack"), str(image_path), prefix])
    assert "Wrote" in capsys.readouterr().out

    binary = cv2.imread(prefix + "_BIN.png", cv2.IMREAD_GRAYSCALE)
    text = cv2.imread(prefix + "_text.png", cv2.IMREAD_GRAYSCALE)
    rec = cv2.imread(prefix + "_bg.png")
    assert binary.shape == (64, 96)
    assert set(np.unique(binary)) <= {0, 255}
    assert text.shape == (64, 96)
    assert rec.shape == (64, 96, 3)

    # default prefix: next to the input image
    main(["prog", str(root / "test.conf"),
          str(root / "models" / "tiny.msgpack"), str(image_path)])
    assert os.path.exists(str(tmp_path / "board") + "_BIN.png")
