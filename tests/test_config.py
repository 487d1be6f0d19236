import os

from lecturemath_tpu.core.config import Config, parse_cli_overrides

REFERENCE_CONF = "/root/reference/ACCESS2021_release/configs/FCN_LectureNet.conf"


def test_parse_reference_config():
    config = Config.from_file(REFERENCE_CONF)
    assert config.get("SAMPLING_FPS") == 1.0
    assert config.get_int("FCN_BINARIZER_NET_DOWN_CONV_FILTERS_1") == 48
    assert config.get_int("FCN_BINARIZER_NET_PIXEL_KERNEL_SIZE") == 7
    assert config.get("BINARIZATION_OUTPUT") == "tempo_binary_"
    assert config.get("CC_STABILITY_MIN_RECALL") == 0.850
    assert config.get("FCN_BINARIZER_TRAIN_CROP_SIZE") == (256, 256)
    assert config.get_bool("FCN_BINARIZER_USE_CUDA") is True
    assert config.get_int("VIDEO_SEGMENTATION_METHOD") == 3


def test_types_and_defaults(tmp_path):
    path = tmp_path / "test.conf"
    path.write_text("\n".join([
        "# comment",
        "int_key = 42",
        "float_key = 0.5",
        "str_key = some/path_",
        "tuple_key = (1, 2)",
        "bool_key = 1",
        "eq_key = a=b",  # reference drops this line; we keep it
    ]))
    config = Config.from_file(str(path))
    assert config.get("INT_KEY") == 42
    assert config.get("FLOAT_KEY") == 0.5
    assert config.get("STR_KEY") == "some/path_"
    assert config.get("TUPLE_KEY") == (1, 2)
    assert config.get_bool("BOOL_KEY") is True
    assert config.get("EQ_KEY") == "a=b"
    assert config.get("MISSING", "fallback") == "fallback"


def test_save_round_trip(tmp_path):
    config = Config({"A_KEY": 7, "B_KEY": "text"})
    out = tmp_path / "out.conf"
    config.save(str(out))
    loaded = Config.from_file(str(out))
    assert loaded.get("A_KEY") == 7
    assert loaded.get("B_KEY") == "text"
    assert list(loaded) == ["A_KEY", "B_KEY"]


def test_cli_overrides():
    params = parse_cli_overrides(["-l", "lec01", "lec02", "-d", "training",
                                  "-img_t", "0.5"])
    assert params["l"] == ["lec01", "lec02"]
    assert params["d"] == "training"
    assert params["img_t"] == "0.5"
