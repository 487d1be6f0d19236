"""Doctor CLI: environment + workspace diagnostics with honest exit codes."""

import os

DB_XML = """<AccessMath><DataBase><Name>DRDB</Name>
<OutputPaths><Temporal>temporal</Temporal><Images>images</Images>
<Videos>videos</Videos><Annotations>annotations</Annotations>
<Summaries>summaries</Summaries></OutputPaths>
<Datasets><Testing><LectureTitle>dr01</LectureTitle></Testing></Datasets>
<Lectures><Lecture><Id>dr01</Id><Title>dr01</Title><Parameters></Parameters>
<Videos><Main><Video><Path>dr01.mp4</Path></Video></Main></Videos>
</Lecture></Lectures></DataBase></AccessMath>
"""


def _workspace(tmp_path, with_video=True):
    (tmp_path / "db.xml").write_text(DB_XML)
    (tmp_path / "models").mkdir()
    (tmp_path / "models" / "m.msgpack").write_bytes(b"\x80")
    if with_video:
        (tmp_path / "videos").mkdir()
        (tmp_path / "videos" / "dr01.mp4").write_bytes(b"x")
    conf = tmp_path / "dr.conf"
    conf.write_text(
        f"VIDEO_DATABASE_PATH = {tmp_path}/db.xml\n"
        f"VIDEO_FILES_PATH = {tmp_path}/videos\n"
        f"OUTPUT_PATH = {tmp_path}/output\n"
        "BINARIZATION_FCN_LECTURENET_DIR = "
        f"{tmp_path}/models\n"
        "BINARIZATION_FCN_LECTURENET_FILENAME = m.msgpack\n")
    return str(conf)


def test_doctor_workspace_passes(tmp_path, capsys):
    from lecturemath_tpu.cli.doctor import main

    assert main(["prog", _workspace(tmp_path)]) == 0
    out = capsys.readouterr().out
    for line in ("[PASS] config parses", "[PASS] lecture database",
                 "[PASS] video inputs", "[PASS] model checkpoint",
                 "[PASS] output tree", "ALL CHECKS PASSED"):
        assert line in out, line


def test_doctor_missing_video_warns_not_fails(tmp_path, capsys):
    from lecturemath_tpu.cli.doctor import main

    assert main(["prog", _workspace(tmp_path, with_video=False)]) == 0
    out = capsys.readouterr().out
    assert "[WARN] video inputs" in out and "dr01" in out


def test_doctor_bad_database_fails(tmp_path, capsys):
    from lecturemath_tpu.cli.doctor import main

    conf = tmp_path / "bad.conf"
    conf.write_text("VIDEO_DATABASE_PATH = /nope/db.xml\n")
    assert main(["prog", str(conf)]) == 1
    out = capsys.readouterr().out
    assert "[FAIL] lecture database" in out
    assert "CHECK(S) FAILED" in out


def test_doctor_missing_checkpoint_fails(tmp_path, capsys):
    from lecturemath_tpu.cli.doctor import main

    conf = _workspace(tmp_path)
    os.remove(str(tmp_path / "models" / "m.msgpack"))
    assert main(["prog", conf]) == 1
    assert "[FAIL] model checkpoint" in capsys.readouterr().out


def test_doctor_bad_database_still_reports_config_scoped_checks(tmp_path,
                                                                capsys):
    """One-shot diagnostics: a failed database check must not hide the
    checkpoint/output checks (they only need the parsed config)."""
    from lecturemath_tpu.cli.doctor import main

    conf = tmp_path / "bad.conf"
    conf.write_text("VIDEO_DATABASE_PATH = /nope/db.xml\n"
                    f"OUTPUT_PATH = {tmp_path}/out\n")
    assert main(["prog", str(conf)]) == 1
    out = capsys.readouterr().out
    assert "[FAIL] lecture database" in out
    assert "[FAIL] model checkpoint" in out     # still reported
    assert "[PASS] output tree" in out


def test_doctor_probe_opt_out_never_touches_devices(monkeypatch, capsys):
    """With the probe opted out the doctor must not call jax.devices()
    unbounded — it would hang on exactly the outage it exists to name."""
    import jax

    def boom():
        raise AssertionError("doctor must not touch the backend")

    monkeypatch.setattr(jax, "devices", boom)
    monkeypatch.setenv("LM_DEVICE_PROBE_TIMEOUT_S", "0")
    from lecturemath_tpu.cli.doctor import main

    assert main(["prog"]) == 0
    assert "probe skipped" in capsys.readouterr().out


def test_doctor_environment_only(capsys):
    from lecturemath_tpu.cli.doctor import main

    assert main(["prog"]) == 0
    out = capsys.readouterr().out
    assert "[PASS] device backend" in out
    assert "[PASS] native C++ kernels" in out
