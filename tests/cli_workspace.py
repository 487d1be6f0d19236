"""Shared builder for a tiny CLI-drivable workspace: synthetic video,
tiny-width config, random-init checkpoint. Used by the CLI mesh tests
(single-process and 2-process)."""

def build_cli_workspace(tmp_path, name="mesh", n_frames=8):
    import cv2
    import jax

    from lecturemath_tpu.core.config import Config
    from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig,
                                                       FCNLectureNet,
                                                       init_variables)
    from lecturemath_tpu.pipeline.binarize import save_checkpoint_variables
    from lecturemath_tpu.utils.synthetic import synthetic_rgb_lecture
    from test_e2e_pipeline import DB_XML

    root = tmp_path / name
    root.mkdir(parents=True, exist_ok=True)
    (root / "db.xml").write_text(DB_XML)
    (root / "videos").mkdir(exist_ok=True)
    (root / "models").mkdir(exist_ok=True)

    rgb, _, _, _ = synthetic_rgb_lecture(seed=1, n_frames=n_frames,
                                         height=96, width=128, n_boards=1,
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

    config = Config.from_file(str(root / "test.conf"))
    net_config = FCNConfig.from_config(config)
    model = FCNLectureNet(net_config)
    variables = init_variables(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
    save_checkpoint_variables(variables,
                              str(root / "models" / "tiny.msgpack"))
    return root
