"""ST3D visualizer: session queries mirror the reference ST3D_Visualizer
inspection semantics (unique CC under pixel + group covering pixel,
reference: AccessMath/util/ST3D_visualizer.py:340-410), and the browser
HTTP surface serves state/frames/queries headlessly."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from lecturemath_tpu.data.space_time import SpaceTimeStruct
from lecturemath_tpu.pipeline.cc_tracking import CCTracker
from lecturemath_tpu.utils.st3d_visualizer import (ST3DVisualizerSession,
                                                   serve)
from lecturemath_tpu.utils.synthetic import synthetic_lecture


@pytest.fixture(scope="module")
def session():
    frames, _, _ = synthetic_lecture(seed=11, n_frames=20, height=64,
                                     width=96, n_boards=2,
                                     glyphs_per_board=4)
    tracker = CCTracker(width=96, height=64)
    for frame in frames:
        tracker.add_frame(frame)

    # stage-03 computation, same call sequence as stages.stage03_cc_grouping
    tracker.split_stable_by_gaps(85, 3)
    stable = tracker.stable_cc_idxs(3)
    time_overlapping, _, _ = tracker.compute_overlapping_stable(stable, 5)
    groups, _ = tracker.compute_groups(stable, time_overlapping, 0.0)
    group_ages, groups_per_frame = tracker.compute_group_ages(groups)
    group_images, group_boundaries = \
        tracker.compute_group_images(groups, group_ages, 0.5)
    clean = tracker.clean_frames_from_groups(
        groups, group_boundaries, groups_per_frame, group_ages, group_images)

    frame_times = [float(i) for i in range(len(frames))]
    frame_indices = [i * 30 for i in range(len(frames))]
    st3d = SpaceTimeStruct(frame_times, frame_indices, 64, 96,
                           group_ages, group_images, group_boundaries)
    return ST3DVisualizerSession(frame_times, frame_indices, tracker, st3d,
                                 clean_frames=clean, lecture="viz01")


def _ink_pixel(session, pos):
    """An ink pixel of the first CC present at sample ``pos``."""
    uidx, cc = session.tracker.cc_idx_per_frame[pos][0]
    ys, xs = np.nonzero(cc.img)
    return uidx, cc, int(xs[0] + cc.min_x), int(ys[0] + cc.min_y)


def test_state_shape(session):
    state = session.state()
    assert state["n_samples"] == 20
    assert state["width"] == 96 and state["height"] == 64
    assert state["n_unique_ccs"] == len(session.tracker.unique_ccs) > 0
    assert state["n_groups"] > 0
    assert state["has_reconstructed"]
    assert state["frame_indices"][1] == 30


def test_frame_image_modes(session):
    for mode in ("binary", "reconstructed", "stable"):
        image = session.frame_image(8, mode)
        assert image.shape == (64, 96, 3) and image.dtype == np.uint8
        assert image.max() > 0, mode
    # binary mode matches the tracker's own rebuilt frames bit for bit
    rebuilt = session.tracker.rebuilt_binary_frames()[8]
    assert (session.frame_image(8, "binary")[:, :, 0] == rebuilt).all()
    # reconstructed mode serves the stage-03 clean frames
    assert (session.frame_image(8, "reconstructed")[:, :, 0]
            == session.clean_frames[8]).all()
    with pytest.raises(IndexError):
        session.frame_image(20, "binary")
    with pytest.raises(ValueError):
        session.frame_image(0, "nope")


def test_reconstructed_mode_without_artifact_is_an_error(session):
    """Serving the rebuilt binary labeled as the stage-03 reconstruction
    would have the user debugging the wrong artifact — refuse instead."""
    bare = ST3DVisualizerSession(session.frame_times, session.frame_indices,
                                 session.tracker, session.st3d,
                                 clean_frames=None)
    assert not bare.state()["has_reconstructed"]
    assert bare.frame_image(3, "binary").shape == (64, 96, 3)
    with pytest.raises(ValueError, match="CC_RECONSTRUCTED_OUTPUT"):
        bare.frame_image(3, "reconstructed")


def test_concurrent_binary_renders(session):
    """The binary-render cache is shared across HTTP handler threads."""
    import concurrent.futures

    fresh = ST3DVisualizerSession(session.frame_times, session.frame_indices,
                                  session.tracker, session.st3d)
    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        images = list(pool.map(
            lambda pos: fresh.frame_image(pos % 20, "binary"),
            range(200)))
    rebuilt = session.tracker.rebuilt_binary_frames()
    for pos, image in enumerate(images):
        assert (image[:, :, 0] == rebuilt[pos % 20]).all()


def test_query_cc_under_ink_pixel(session):
    pos = 8     # mid-era: glyphs are stable and grouped here
    uidx, cc, x, y = _ink_pixel(session, pos)
    result = session.query(pos, x, y)
    assert result["frame_index"] == session.frame_indices[pos]
    assert result["cc"] is not None
    assert result["cc"]["id"] == uidx
    assert result["cc"]["box"] == [cc.min_x, cc.min_y, cc.max_x, cc.max_y]
    assert result["cc"]["size"] == cc.size
    sightings = session.tracker.unique_cc_frames[uidx]
    assert result["cc"]["instances"] == len(sightings)
    assert result["cc"]["first_frame"] == \
        session.frame_indices[sightings[0][0]]
    # a stable mid-era glyph belongs to a group whose image inks the pixel
    assert result["group"] is not None
    gbox = result["group"]["box"]
    assert gbox[0] <= x <= gbox[2] and gbox[1] <= y <= gbox[3]
    ages = result["group"]["ages"]
    assert ages[0] <= result["frame_index"] <= ages[-1]


def test_query_background_pixel(session):
    result = session.query(8, 0, 0)
    assert result["cc"] is None and result["group"] is None


def test_query_out_of_range(session):
    with pytest.raises(IndexError):
        session.query(99, 0, 0)


def test_query_consistent_with_rendered_views(session):
    """Property: every ink pixel of the rendered binary view must query
    to a CC containing it, and every ink pixel of the stable-group view
    to a group whose box contains it (sampled grid, several frames)."""
    for pos in (2, 8, 14, 19):
        binary = session.frame_image(pos, "binary")[:, :, 0]
        stable = session.frame_image(pos, "stable")[:, :, 0]
        ys, xs = np.nonzero(binary)
        for y, x in list(zip(ys.tolist(), xs.tolist()))[::37]:
            result = session.query(pos, x, y)
            assert result["cc"] is not None, (pos, x, y)
            box = result["cc"]["box"]
            assert box[0] <= x <= box[2] and box[1] <= y <= box[3]
        ys, xs = np.nonzero(stable)
        for y, x in list(zip(ys.tolist(), xs.tolist()))[::41]:
            result = session.query(pos, x, y)
            assert result["group"] is not None, (pos, x, y)
            gbox = result["group"]["box"]
            assert gbox[0] <= x <= gbox[2] and gbox[1] <= y <= gbox[3]


def test_http_surface(session):
    server = serve(session, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "ST3D visualizer" in page

        state = json.loads(urllib.request.urlopen(
            f"{base}/api/state").read())
        assert state["lecture"] == "viz01" and state["n_samples"] == 20

        png = urllib.request.urlopen(
            f"{base}/img/frame/8.png?mode=stable").read()
        assert png[:4] == b"\x89PNG"

        _, _, x, y = _ink_pixel(session, 8)
        query = json.loads(urllib.request.urlopen(
            f"{base}/api/query?pos=8&x={x}&y={y}").read())
        assert query["cc"] is not None

        for bad in ("/img/frame/999.png", "/api/query?pos=0&x=a&y=0",
                    "/nope"):
            with pytest.raises(urllib.error.HTTPError) as excinfo:
                urllib.request.urlopen(base + bad)
            assert excinfo.value.code == 404
    finally:
        server.shutdown()
        server.server_close()
