"""The zero-setup demo builds its own workspace and runs all 5 stages."""

import os
import xml.etree.ElementTree as ET

import numpy as np


def test_quickstart_end_to_end(tmp_path, capsys):
    import cv2

    from lecturemath_tpu.cli.quickstart import main

    root = str(tmp_path / "qs")
    main(["quickstart", root])
    out = capsys.readouterr().out
    assert "Done. Summary exported" in out

    summary = os.path.join(root, "output", "summaries", "QuickDB_demo01")
    ET.parse(os.path.join(summary, "segments.xml"))
    kf_dir = os.path.join(summary, "keyframes")
    pngs = sorted(os.listdir(kf_dir))
    # one keyframe per synthetic board, each with ink (exported ink=0)
    assert len(pngs) == 2
    for name in pngs:
        img = cv2.imread(os.path.join(kf_dir, name), 0)
        assert (img == 0).sum() > 0

    # idempotent: a second run reuses the workspace and still succeeds
    main(["quickstart", root])
    assert "Done. Summary exported" in capsys.readouterr().out
