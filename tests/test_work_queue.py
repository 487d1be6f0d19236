"""Dynamic multi-host lecture scheduling: filesystem claim queue
(parallel/work_queue.py) and its -queue wiring in the pipeline driver."""

import json
import multiprocessing
import os

import pytest

from lecturemath_tpu.core.config import Config
from lecturemath_tpu.core.metadata import MetaDataDB
from lecturemath_tpu.parallel.work_queue import (claim, queue_state,
                                                 release, requeue_stale)
from lecturemath_tpu.pipeline.driver import PipelineDriver

DB_XML = """<AccessMath><DataBase><Name>WQDB</Name>
<OutputPaths><Temporal>temporal</Temporal><Images>images</Images>
<Videos>videos</Videos><Annotations>annotations</Annotations>
<Summaries>summaries</Summaries></OutputPaths>
<Datasets><Testing>{titles}</Testing></Datasets>
<Lectures>{lectures}</Lectures></DataBase></AccessMath>
"""


def _db_xml(n):
    titles = "".join(f"<LectureTitle>lec{k:02d}</LectureTitle>"
                     for k in range(n))
    lectures = "".join(
        f"<Lecture><Id>lec{k:02d}</Id><Title>lec{k:02d}</Title>"
        f"<Parameters></Parameters><Videos><Main><Video>"
        f"<Path>lec{k:02d}.mp4</Path></Video></Main></Videos></Lecture>"
        for k in range(n))
    return DB_XML.format(titles=titles, lectures=lectures)


def test_claim_release_state(tmp_path):
    queue = str(tmp_path / "q")
    assert claim(queue, "lec01")
    assert not claim(queue, "lec01")          # second claim loses
    assert claim(queue, "lec02")
    release(queue, "lec01", ok=True)
    release(queue, "lec02", ok=False)
    state = queue_state(queue)
    assert state["lec01"]["done"] is True
    assert state["lec02"]["done"] is False
    assert state["lec01"]["pid"] == os.getpid()


def _claim_worker(queue, items, out_path):
    mine = [item for item in items if claim(queue, item)]
    with open(out_path, "w") as f:
        json.dump(mine, f)


def test_cross_process_claims_disjoint_and_complete(tmp_path):
    """Two real processes racing over the same queue: every item claimed
    exactly once, union complete (O_CREAT|O_EXCL atomicity)."""
    queue = str(tmp_path / "q")
    items = [f"lec{k:02d}" for k in range(16)]
    outs = [str(tmp_path / f"out{p}.json") for p in range(2)]
    procs = [multiprocessing.Process(target=_claim_worker,
                                     args=(queue, items, outs[p]))
             for p in range(2)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0
    claimed = []
    for out in outs:
        with open(out) as f:
            claimed.extend(json.load(f))
    assert sorted(claimed) == items           # complete and disjoint


def test_requeue_stale(tmp_path):
    queue = str(tmp_path / "q")
    assert claim(queue, "alive")
    assert claim(queue, "crashed")
    assert claim(queue, "finished")
    release(queue, "finished", ok=True)
    # age only the crashed claim
    path = os.path.join(queue, "crashed.claim")
    with open(path) as f:
        record = json.load(f)
    record["claimed_at"] -= 10_000
    with open(path, "w") as f:
        json.dump(record, f)

    requeued = requeue_stale(queue, max_age_s=3600)
    assert requeued == ["crashed"]
    assert claim(queue, "crashed")            # claimable again
    assert not claim(queue, "alive")          # fresh claim untouched
    assert queue_state(queue)["finished"]["done"] is True


@pytest.fixture()
def driver_workspace(tmp_path):
    (tmp_path / "db.xml").write_text(_db_xml(5))
    (tmp_path / "wq.conf").write_text(
        f"VIDEO_DATABASE_PATH = {tmp_path}/db.xml\n"
        f"OUTPUT_PATH = {tmp_path}/output\n")
    return tmp_path


def _drive(root, argv):
    driver = PipelineDriver.from_config_path(str(root / "wq.conf"),
                                             argv, None, None)
    driver.database = MetaDataDB.from_file(str(root / "db.xml"))
    return driver


def test_driver_queue_mode(driver_workspace):
    """Two drivers sharing one -queue dir split the lectures dynamically:
    disjoint coverage, complete union, claims marked done."""
    queue = str(driver_workspace / "claims")
    a = _drive(driver_workspace, ["-queue", queue])
    b = _drive(driver_workspace, ["-queue", queue])

    it_a, it_b = a.iter_lectures(), b.iter_lectures()
    seen_a, seen_b = [], []
    # interleave: a claims one, then b runs dry, then a drains the rest
    seen_a.append(next(it_a).title)
    seen_b.extend(lec.title for lec in it_b)
    seen_a.extend(lec.title for lec in it_a)

    assert sorted(seen_a + seen_b) == [f"lec{k:02d}" for k in range(5)]
    assert not (set(seen_a) & set(seen_b))
    assert len(seen_b) == 4                   # b grabbed all but a's first
    state = queue_state(queue)
    assert len(state) == 5
    assert all(record["done"] for record in state.values())


def test_driver_queue_respects_filters(driver_workspace):
    queue = str(driver_workspace / "claims2")
    driver = _drive(driver_workspace,
                    ["-queue", queue, "-l", "lec01", "lec03"])
    titles = [lec.title for lec in driver.iter_lectures()]
    assert titles == ["lec01", "lec03"]
    assert sorted(queue_state(queue)) == ["lec01", "lec03"]


def test_driver_queue_shard_exclusive(driver_workspace):
    driver = _drive(driver_workspace,
                    ["-queue", str(driver_workspace / "q"),
                     "-shard", "0/2"])
    with pytest.raises(ValueError):
        list(driver.iter_lectures())


def test_driver_requeue_rejects_bare_and_nonpositive(driver_workspace):
    """A bare '-requeue' parses as True and float(True) == 1.0 — which
    would recycle every live claim in a running fleet. Same for <= 0."""
    queue = str(driver_workspace / "q2")
    for bad_argv in (["-queue", queue, "-requeue"],
                     ["-queue", queue, "-requeue", "-5"],
                     ["-queue", queue, "-requeue", "0"],
                     ["-queue", queue, "-requeue", "soon"]):
        driver = _drive(driver_workspace, bad_argv)
        with pytest.raises(ValueError, match="-requeue"):
            list(driver.iter_lectures())
    # requeue without a queue is also a usage error
    driver = _drive(driver_workspace, ["-requeue", "3600"])
    with pytest.raises(ValueError, match="-requeue requires -queue"):
        list(driver.iter_lectures())


def test_requeue_failed_release(tmp_path):
    """release(ok=False) keeps the failure visible but requeue_stale
    recycles it regardless of age (the documented recycle contract)."""
    queue = str(tmp_path / "q")
    assert claim(queue, "boom")
    release(queue, "boom", ok=False)
    assert queue_state(queue)["boom"]["done"] is False
    assert not claim(queue, "boom")           # still claimed (visible)
    assert requeue_stale(queue, max_age_s=3600) == ["boom"]
    assert claim(queue, "boom")               # claimable again


def test_requeue_skips_claim_changed_since_scan(tmp_path, monkeypatch):
    """If a stale-looking claim changes between the queue scan and the
    unlink (the slow-but-alive claimer finished, or another host
    requeued + re-claimed), requeue_stale must NOT delete it."""
    from lecturemath_tpu.parallel import work_queue

    queue = str(tmp_path / "q")
    assert claim(queue, "slowpoke")
    stale_view = {k: dict(v) for k, v in queue_state(queue).items()}
    stale_view["slowpoke"]["claimed_at"] = 0.0   # looks ancient
    # the real file moves on: the claimer completes the lecture
    release(queue, "slowpoke", ok=True)
    monkeypatch.setattr(work_queue, "queue_state",
                        lambda d: stale_view)
    assert work_queue.requeue_stale(queue, max_age_s=10.0) == []
    assert queue_state(queue)["slowpoke"]["done"] is True   # preserved


def test_concurrent_claims_exactly_once(tmp_path):
    """N threads race to claim/process/release a shared lecture list;
    every item must be processed EXACTLY once (the O_CREAT|O_EXCL
    atomicity contract the multi-host queue rests on)."""
    import threading
    from collections import Counter

    queue = str(tmp_path / "q")
    items = [f"lec{k:02d}" for k in range(40)]
    processed = Counter()
    lock = threading.Lock()

    def host():
        for item in items:
            if claim(queue, item):
                with lock:
                    processed[item] += 1
                release(queue, item, ok=True)

    threads = [threading.Thread(target=host) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert sorted(processed) == items          # every item processed
    assert set(processed.values()) == {1}      # exactly once
    state = queue_state(queue)
    assert all(state[item]["done"] is True for item in items)


def test_driver_requeue_flag_recycles_dead_claims(driver_workspace):
    """-requeue SECONDS on a -queue run recycles a dead host's stale
    claim (and a failed release) before claiming; guarded usage errors
    for -requeue without -queue or a non-numeric age."""
    import json
    import os

    queue = str(driver_workspace / "claims")
    # a "dead host" claimed lec01 long ago and never released
    assert claim(queue, "lec01")
    path = os.path.join(queue, "lec01.claim")
    with open(path) as f:
        record = json.load(f)
    record["claimed_at"] -= 7200.0
    with open(path, "w") as f:
        json.dump(record, f)
    # and lec02 failed
    assert claim(queue, "lec02")
    release(queue, "lec02", ok=False)

    driver = _drive(driver_workspace,
                    ["-queue", queue, "-requeue", "3600"])
    seen = [lec.title for lec in driver.iter_lectures()]
    assert sorted(seen) == [f"lec{k:02d}" for k in range(5)]  # all run
    state = queue_state(queue)
    assert all(state[t]["done"] is True for t in seen)

    bad = _drive(driver_workspace, ["-requeue", "3600"])
    with pytest.raises(ValueError, match="requires -queue"):
        list(bad.iter_lectures())
    bad2 = _drive(driver_workspace,
                  ["-queue", queue, "-requeue", "soon"])
    with pytest.raises(ValueError, match="seconds"):
        list(bad2.iter_lectures())
