from lecturemath_tpu.core.metadata import MetaDataDB

REFERENCE_DB = "/root/reference/ACCESS2021_release/lecture_data/db_LectureMath.xml"


def test_parse_reference_db():
    db = MetaDataDB.from_file(REFERENCE_DB)
    assert db.name == "LectureMath"
    assert db.output_temporal == "temporal"
    assert db.output_summaries == "summaries"
    assert len(db.lectures) == 60

    lecture = db.get_lecture("00000_000_001")
    assert lecture is not None
    assert lecture.parameters["forced_width"] == 1920
    assert lecture.parameters["forced_height"] == 1080
    assert lecture.main_videos[0]["path"] == "00000_000_001.mp4"

    training = db.get_dataset("training")
    testing = db.get_dataset("testing")
    assert training is not None and testing is not None
    assert len(training.lecture_titles) == 17
    assert len(testing.lecture_titles) == 17
    assert lecture in training
