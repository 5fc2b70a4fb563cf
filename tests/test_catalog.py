"""Snapshot catalog semantics: commits, append chains, time travel,
rollback, property patching, vacuum."""

from __future__ import annotations

import os

import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import Catalog


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path))


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x int")


def test_overwrite_and_read(spark, cat):
    cat.write("t", _df(spark, [1, 2, 3]))
    cat.write("t", _df(spark, [4, 5]))
    assert sorted(r["x"] for r in cat.read(spark, "t").collect()) == [4, 5]
    assert len(cat.snapshots("t")) == 2


def test_append_unions_parents(spark, cat):
    cat.write("t", _df(spark, [1]))
    cat.write("t", _df(spark, [2]), mode="append")
    cat.write("t", _df(spark, [3]), mode="append")
    assert sorted(r["x"] for r in cat.read(spark, "t").collect()) == [1, 2, 3]


def test_time_travel_and_rollback(spark, cat):
    s1 = cat.write("t", _df(spark, [1]))
    s2 = cat.write("t", _df(spark, [2]))
    assert [r["x"] for r in cat.read(spark, "t", snapshot_id=s1.snapshot_id).collect()] == [1]
    cat.rollback("t", s1.snapshot_id)
    assert [r["x"] for r in cat.read(spark, "t").collect()] == [1]
    assert cat.current_snapshot("t").snapshot_id == s1.snapshot_id
    # a new write after rollback becomes the new current
    s3 = cat.write("t", _df(spark, [9]))
    assert s3.snapshot_id > s2.snapshot_id
    assert [r["x"] for r in cat.read(spark, "t").collect()] == [9]


def test_properties_and_update(spark, cat):
    cat.write("t", _df(spark, [1]), properties={"wave": 3})
    cat.update_properties("t", {"pages": 7})
    snap = cat.current_snapshot("t")
    assert snap.properties["wave"] == 3 and snap.properties["pages"] == 7


def test_vacuum_keeps_current_chain(spark, cat, tmp_path):
    cat.write("t", _df(spark, [1]))
    cat.write("t", _df(spark, [2]), mode="append")
    cat.write("t", _df(spark, [3]))  # overwrite orphans the append chain? no — parent chain
    cat.vacuum("t")
    # current snapshot still readable after vacuum
    assert sorted(r["x"] for r in cat.read(spark, "t").collect()) == [3]


def test_concurrent_writer_cas_conflict(spark, cat):
    """Two writers racing for the same snapshot id: the second loses with
    CommitConflict instead of silently replacing the first's snapshot
    (optimistic concurrency; reference CAS, kvs/Worker.java:318-331)."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import (
        CommitConflict,
    )

    cat.write("t", _df(spark, [1]))
    # writer B claims the next snapshot id (simulating the interleave
    # where B passed the manifest-load but A committed first)
    nxt = cat.current_snapshot("t").snapshot_id + 1
    guard = os.path.join(cat._table_dir("t"), f".commit-{nxt:06d}")
    open(guard, "w").close()
    with pytest.raises(CommitConflict):
        cat.write("t", _df(spark, [2]))
    # state unchanged; after the conflict clears, a retry commits fine
    assert [r["x"] for r in cat.read(spark, "t").collect()] == [1]
    os.unlink(guard)
    cat.write("t", _df(spark, [2]))
    assert [r["x"] for r in cat.read(spark, "t").collect()] == [2]
    # vacuum reclaims consumed guards but keeps an in-flight claim
    inflight = os.path.join(
        cat._table_dir("t"), f".commit-{cat.current_snapshot('t').snapshot_id + 1:06d}"
    )
    open(inflight, "w").close()
    cat.vacuum("t")
    assert os.path.exists(inflight)
    consumed = [
        e for e in os.listdir(cat._table_dir("t"))
        if e.startswith(".commit-") and e != os.path.basename(inflight)
    ]
    assert consumed == []


def test_crashed_writer_guard_reclaimed(spark, cat):
    """A guard orphaned by a crash between the CAS claim and the
    manifest replace (its id never committed, older than the live-claim
    window) must not block a restarted run — the resume re-commits the
    interrupted snapshot instead of raising CommitConflict forever
    (the ResumableIndexer / PageRank-checkpoint crash-resume path)."""
    import time as _time

    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import (
        STALE_GUARD_SECONDS,
    )

    cat.write("t", _df(spark, [1]))
    nxt = cat.current_snapshot("t").snapshot_id + 1
    guard = os.path.join(cat._table_dir("t"), f".commit-{nxt:06d}")
    open(guard, "w").close()
    old = _time.time() - (STALE_GUARD_SECONDS + 5)
    os.utime(guard, (old, old))
    # restarted run re-commits straight through the orphan claim
    cat.write("t", _df(spark, [2]))
    assert [r["x"] for r in cat.read(spark, "t").collect()] == [2]


def test_crash_mid_data_write_leaves_no_guard(spark, cat):
    """The expensive data write happens BEFORE the CAS claim: a writer
    dying mid-parquet-write leaves only an orphan data dir (reclaimed by
    vacuum), never a guard — so resume is never blocked by it."""
    cat.write("t", _df(spark, [1]))
    # simulate the crash leftover: an orphan data dir for the next id
    orphan = os.path.join(cat._table_dir("t"), "data-000002-deadbeef")
    _df(spark, [99]).write.mode("overwrite").parquet(orphan)
    assert not any(
        e.startswith(".commit-000002") for e in os.listdir(cat._table_dir("t"))
    )
    cat.write("t", _df(spark, [2]))  # resume commits fine
    assert [r["x"] for r in cat.read(spark, "t").collect()] == [2]
    cat.vacuum("t")
    assert not os.path.exists(orphan)

def test_slow_writer_cannot_erase_committed_snapshot(spark, cat):
    """Lost-update window (r3 ADVICE high): writer B loads the manifest,
    then spends > STALE_GUARD_SECONDS on its data write while writer A
    commits the same snapshot id. B must NOT judge A's consumed guard
    'orphaned' from its stale manifest view and os.replace A's commit
    away — the guard handler re-loads the manifest from disk and raises
    CommitConflict because the id is now committed."""
    import copy
    import time as _time

    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import (
        STALE_GUARD_SECONDS,
        CommitConflict,
    )

    cat.write("t", _df(spark, [1]))
    stale_manifest = copy.deepcopy(cat._load_manifest("t"))  # B's view: id 2 free
    cat.write("t", _df(spark, [100]))  # A commits snapshot 2 mid-B's-write
    guard = os.path.join(cat._table_dir("t"), ".commit-000002")
    assert os.path.exists(guard)
    old = _time.time() - (STALE_GUARD_SECONDS + 5)
    os.utime(guard, (old, old))  # B's data write took this long
    real_load = cat._load_manifest
    calls = {"n": 0}

    def load_stale_then_real(name):
        calls["n"] += 1
        # B's top-of-write() manifest + parent loads see the stale view
        return copy.deepcopy(stale_manifest) if calls["n"] <= 2 else real_load(name)

    cat._load_manifest = load_stale_then_real
    try:
        with pytest.raises(CommitConflict):
            cat.write("t", _df(spark, [2]))
    finally:
        del cat.__dict__["_load_manifest"]
    # A's snapshot survives, B's retry (fresh manifest) lands as id 3
    assert [r["x"] for r in cat.read(spark, "t").collect()] == [100]
    cat.write("t", _df(spark, [2]))
    assert [r["x"] for r in cat.read(spark, "t").collect()] == [2]
    assert cat.current_snapshot("t").snapshot_id == 3


def test_orphan_guard_takeover_is_atomic(spark, cat):
    """Two resumed writers racing to reclaim the same crashed guard:
    takeover is unlink + O_EXCL re-create, so exactly one wins; the
    loser sees FileExistsError on the re-create and gets CommitConflict."""
    import time as _time

    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import (
        STALE_GUARD_SECONDS,
        CommitConflict,
    )

    cat.write("t", _df(spark, [1]))
    nxt = cat.current_snapshot("t").snapshot_id + 1
    guard = os.path.join(cat._table_dir("t"), f".commit-{nxt:06d}")
    open(guard, "w").close()
    old = _time.time() - (STALE_GUARD_SECONDS + 5)
    os.utime(guard, (old, old))
    # simulate the rival resumed writer winning the re-create: after this
    # writer unlinks the stale guard, the rival's O_EXCL lands first
    real_unlink = os.unlink

    def unlink_then_rival_claims(path, *a, **kw):
        real_unlink(path, *a, **kw)
        if os.path.basename(path).startswith(".commit-"):
            open(path, "w").close()  # rival's fresh (recent-mtime) claim

    import unittest.mock as mock

    with mock.patch("distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog.os.unlink", side_effect=unlink_then_rival_claims):
        with pytest.raises(CommitConflict):
            cat.write("t", _df(spark, [2]))
    # the rival's claim survives; state unchanged
    assert os.path.exists(guard)
    assert [r["x"] for r in cat.read(spark, "t").collect()] == [1]


def test_rival_takeover_cannot_unlink_fresh_guard(spark, cat):
    """r4 ADVICE medium: TWO resumed writers both judge the same guard
    stale. Writer A completes its takeover first (marker + unlink +
    fresh guard); writer B — holding only its pre-takeover stat — must
    lose the (ino, mtime_ns) takeover marker and never touch A's LIVE
    guard. The old unconditional unlink removed A's fresh guard here,
    letting both writers claim the same snapshot id."""
    import time as _time
    import unittest.mock as mock

    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import (
        STALE_GUARD_SECONDS,
        CommitConflict,
    )

    cat.write("t", _df(spark, [1]))
    nxt = cat.current_snapshot("t").snapshot_id + 1
    guard = os.path.join(cat._table_dir("t"), f".commit-{nxt:06d}")
    open(guard, "w").close()
    old = _time.time() - (STALE_GUARD_SECONDS + 5)
    os.utime(guard, (old, old))

    real_open = os.open
    state = {"raced": False}

    def open_with_rival(path, flags, *a, **kw):
        base = os.path.basename(str(path))
        if ".takeover-" in base and not state["raced"]:
            state["raced"] = True
            # rival A — who statted the SAME dead guard instance — lands
            # its whole takeover between B's stat and B's marker claim
            os.close(real_open(path, flags, *a, **kw))  # A's marker
            os.unlink(guard)
            os.close(
                real_open(guard, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            )  # A's FRESH guard (live claim)
        return real_open(path, flags, *a, **kw)

    with mock.patch(
        "distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog.os.open",
        side_effect=open_with_rival,
    ):
        with pytest.raises(CommitConflict):
            cat.write("t", _df(spark, [2]))
    # A's live guard survived B's loss — B never reached an unlink
    assert os.path.exists(guard)
    assert _time.time() - os.path.getmtime(guard) < STALE_GUARD_SECONDS
    assert [r["x"] for r in cat.read(spark, "t").collect()] == [1]


def test_vacuum_sweeps_consumed_takeover_markers(spark, cat):
    """Takeover markers persist past the commit (deleting them early
    re-opens the double-claim race) and are swept by vacuum once their
    snapshot id is committed — in-flight ids' markers survive."""
    cat.write("t", _df(spark, [1]))
    tdir = cat._table_dir("t")
    committed = os.path.join(tdir, ".commit-000001.takeover-12345-67890")
    inflight = os.path.join(tdir, ".commit-000099.takeover-11111-22222")
    open(committed, "w").close()
    open(inflight, "w").close()
    cat.vacuum("t")
    assert not os.path.exists(committed)
    assert os.path.exists(inflight)
