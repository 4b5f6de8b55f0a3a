"""Incremental view maintenance: refresh-by-retraction must equal the
direct aggregate of the source's CURRENT state after every poll, across
every kind of commit a maintained table produces (append, upsert,
compaction, purge-delete), with exactly-once marks and bounded reads."""

import datetime as _dt

import pytest
from pyspark.sql import functions as F

from lambda_kafka_to_s3_parquet_spark.operators.cdc import (
    merge_cdc_batch,
    purge_tombstones,
)
from lambda_kafka_to_s3_parquet_spark.operators.ivm import (
    incremental_view_refresh,
    read_view,
)
from lambda_kafka_to_s3_parquet_spark.operators.snapshots import (
    current_version,
    snapshot_read,
)


def _ts(x):
    return _dt.datetime.fromisoformat(x)


SCHEMA = "k long, ts timestamp, op string, g string, val long"


def _merge(spark, table, rows):
    merge_cdc_batch(
        spark, spark.createDataFrame(rows, SCHEMA), table,
        ["k"], "ts", "ts", commit_protocol="snapshot",
    )


def _direct(spark, table):
    """The oracle: full aggregate of the source's current state."""
    return {
        (r["g"],): (r["n_rows"], r["sum_val"])
        for r in snapshot_read(spark, table)
        .groupBy("g")
        .agg(F.count("*").alias("n_rows"), F.sum("val").alias("sum_val"))
        .collect()
    }


def _got(spark, view):
    return {
        (r["g"],): (r["n_rows"], r["sum_val"])
        for r in read_view(spark, view).collect()
    }


def test_view_equals_direct_agg_across_history(spark, tmp_path):
    """bootstrap -> upsert (incl. a cross-group move) -> compaction ->
    tombstone+purge (true deletes): after every poll the maintained view
    equals the direct aggregate of the current state; a no-new-commits
    poll is mode 'none'; a pure-compaction range advances the mark with
    zero rewritten buckets."""
    from lambda_kafka_to_s3_parquet_spark.operators.snapshots import (
        snapshot_rewrite,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    _merge(spark, src, [
        (1, _ts("2024-01-01 00:00:00"), "c", "a", 10),
        (2, _ts("2024-01-01 00:00:00"), "c", "a", 20),
        (3, _ts("2024-01-01 00:00:00"), "c", "b", 30),
        (4, _ts("2024-01-01 00:00:00"), "c", "b", 40),
        (5, _ts("2024-01-01 00:00:00"), "c", "c", 50),
    ])
    r = incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert r["mode"] == "bootstrap" and r["view_version"] == 1
    assert _got(spark, view) == _direct(spark, src)

    # no new source commits -> none, nothing rewritten
    r = incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert r["mode"] == "none"
    assert current_version(spark, view) == 1

    # upsert: k=2 MOVES a->b with a new value (cross-group retraction),
    # k=3 changes value in place, k=6 is a fresh insert into c
    _merge(spark, src, [
        (2, _ts("2024-01-02 00:00:00"), "u", "b", 25),
        (3, _ts("2024-01-02 00:00:00"), "u", "b", 35),
        (6, _ts("2024-01-02 00:00:00"), "c", "c", 60),
    ])
    snapshot_rewrite(spark, src, ["bucket"])  # compaction inside the range
    r = incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert r["mode"] == "delta"
    assert _got(spark, view) == _direct(spark, src) == {
        ("a",): (1, 10), ("b",): (3, 100), ("c",): (2, 110),
    }

    # true deletes: tombstone k=5 and k=6 then purge them out of state
    _merge(spark, src, [
        (5, _ts("2024-01-03 00:00:00"), "d", "c", 0),
        (6, _ts("2024-01-03 00:00:00"), "d", "c", 0),
    ])
    incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert _got(spark, view) == _direct(spark, src)  # tombstones still rows
    purge_tombstones(spark, src, "op", "ts", "2024-01-04 00:00:00")
    r = incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert r["mode"] == "delta"
    got = _got(spark, view)
    assert got == _direct(spark, src) and ("c",) not in got

    # pure-compaction range: zero change rows, meta-only mark advance
    v_before = current_version(spark, view)
    snapshot_rewrite(spark, src, ["bucket"])
    r = incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert r["mode"] == "delta"
    assert current_version(spark, view) == v_before + 1  # view_mark commit
    assert _got(spark, view) == _direct(spark, src)
    r = incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert r["mode"] == "none"  # the mark really advanced


def test_full_retraction_drops_group_and_bucket(spark, tmp_path):
    """A group whose every row is deleted vanishes from the view, and a
    bucket left with NO groups is dropped from the manifest in the same
    atomic commit (absence-from-frame alone cannot express that)."""
    from lambda_kafka_to_s3_parquet_spark.operators.snapshots import (
        _load_manifest,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    # pick two groups that land in DIFFERENT view buckets (n_buckets=4)
    cands = ["a", "b", "c", "d", "e", "f", "g", "h"]
    buckets = {
        r["g"]: r["vb"]
        for r in spark.createDataFrame([(c,) for c in cands], "g string")
        .select("g", F.pmod(F.xxhash64("g"), F.lit(4)).cast("int").alias("vb"))
        .collect()
    }
    g1 = cands[0]
    g2 = next(c for c in cands if buckets[c] != buckets[g1])

    _merge(spark, src, [
        (1, _ts("2024-01-01 00:00:00"), "c", g1, 10),
        (2, _ts("2024-01-01 00:00:00"), "c", g1, 20),
        (3, _ts("2024-01-01 00:00:00"), "c", g2, 30),
    ])
    incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"],
                             n_buckets=4)
    m = _load_manifest(spark, view, current_version(spark, view))
    assert set(m["partitions"]) == {
        f"vbucket={buckets[g1]}", f"vbucket={buckets[g2]}"
    }

    # delete EVERY row of g2 -> its bucket must drop from the manifest
    _merge(spark, src, [(3, _ts("2024-01-02 00:00:00"), "d", g2, 0)])
    purge_tombstones(spark, src, "op", "ts", "2024-01-03 00:00:00")
    incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"],
                             n_buckets=4)
    m = _load_manifest(spark, view, current_version(spark, view))
    assert set(m["partitions"]) == {f"vbucket={buckets[g1]}"}
    assert _got(spark, view) == {(g1,): (2, 30)}


def test_refresh_is_exactly_once_across_crashes(spark, tmp_path, monkeypatch):
    """The consumed-version mark rides the view commit: a poll that
    crashes BEFORE its commit leaves the view untouched and the retry
    applies the delta exactly once (never twice)."""
    import lambda_kafka_to_s3_parquet_spark.operators.ivm as ivm_mod
    from lambda_kafka_to_s3_parquet_spark.operators import snapshots as snap_mod

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    _merge(spark, src, [
        (1, _ts("2024-01-01 00:00:00"), "c", "a", 10),
        (2, _ts("2024-01-01 00:00:00"), "c", "b", 20),
    ])
    incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    _merge(spark, src, [(3, _ts("2024-01-02 00:00:00"), "c", "a", 30)])

    real = snap_mod.snapshot_overwrite_partitions
    state = {"crashed": False}

    def crashing(*a, **k):
        if not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash before the view commit")
        return real(*a, **k)

    monkeypatch.setattr(snap_mod, "snapshot_overwrite_partitions", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert _got(spark, view) == {("a",): (1, 10), ("b",): (1, 20)}  # untouched

    r = incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert r["mode"] == "delta"
    assert _got(spark, view) == {("a",): (2, 40), ("b",): (1, 20)}
    # and a replayed poll after success is a no-op (mark advanced)
    r = incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert r["mode"] == "none"
    assert _got(spark, view) == {("a",): (2, 40), ("b",): (1, 20)}


def test_spec_drift_and_reserved_names_rejected(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    _merge(spark, src, [(1, _ts("2024-01-01 00:00:00"), "c", "a", 10)])
    incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    _merge(spark, src, [(2, _ts("2024-01-02 00:00:00"), "c", "b", 20)])
    for bad in (
        dict(group_by=["g", "op"]),            # different dims
        dict(sums=[]),                          # different aggregates
        dict(n_buckets=8),                      # different layout
    ):
        kw = dict(group_by=["g"], sums=["val"], n_buckets=16)
        kw.update(bad)
        with pytest.raises(ValueError, match="rebuild the view"):
            incremental_view_refresh(
                spark, src, view, ["k"], kw["group_by"],
                kw["sums"], n_buckets=kw["n_buckets"],
            )
    with pytest.raises(ValueError, match="collides"):
        incremental_view_refresh(
            spark, src, str(tmp_path / "v2"), ["k"], ["n_rows"], ["val"]
        )


def test_untouched_buckets_are_not_rescanned(spark, tmp_path):
    """The scale contract: a refresh whose delta touches one group reads
    only that group's view bucket — untouched buckets never appear in
    the merge plan's scan set (∝ changed data, not view size)."""
    from lambda_kafka_to_s3_parquet_spark.operators.snapshots import (
        _load_manifest,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    rows = [
        (k, _ts("2024-01-01 00:00:00"), "c", f"g{k % 8}", k * 10)
        for k in range(64)
    ]
    _merge(spark, src, rows)
    incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"],
                             n_buckets=8)
    v_before = current_version(spark, view)
    m_pre = _load_manifest(spark, view, v_before)
    assert len(m_pre["partitions"]) > 1  # the contract below is non-trivial

    _merge(spark, src, [(1, _ts("2024-01-02 00:00:00"), "u", "g1", 999)])
    incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"],
                             n_buckets=8)
    m1 = _load_manifest(spark, view, current_version(spark, view))
    # only g1's bucket gained a fresh commit dir; every other bucket's
    # dirs are IDENTICAL to the pre-refresh manifest (not rewritten)
    changed = [
        k for k in m1["partitions"]
        if m1["partitions"][k] != m_pre["partitions"].get(k)
    ]
    g1_bucket = spark.createDataFrame([("g1",)], "g string").select(
        F.pmod(F.xxhash64("g"), F.lit(8)).cast("int").alias("vb")
    ).collect()[0]["vb"]
    assert changed == [f"vbucket={g1_bucket}"]
    assert _got(spark, view) == _direct(spark, src)


def test_pure_drop_overwrite_guard(spark, tmp_path):
    """snapshot_overwrite_partitions(drop_partitions=...) refuses to
    empty the whole table (the overwrite_all rule) but allows a pure
    partition drop that leaves live data."""
    from lambda_kafka_to_s3_parquet_spark.operators.snapshots import (
        snapshot_append,
        snapshot_overwrite_partitions,
    )

    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2)], "id long, p string, v long"
    )
    snapshot_append(spark, table, df, ["p"])
    empty = spark.createDataFrame([], "id long, p string, v long")

    with pytest.raises(ValueError, match="EMPTY snapshot"):
        snapshot_overwrite_partitions(
            spark, table, empty, ["p"], drop_partitions=["p=a", "p=b"]
        )
    v = snapshot_overwrite_partitions(
        spark, table, empty, ["p"], drop_partitions=["p=a"]
    )
    assert v == 2
    assert [(r["id"], r["v"], r["p"]) for r in
            snapshot_read(spark, table).collect()] == [(2, 2, "b")]


def test_cdc_stream_maintains_views(spark, tmp_path, monkeypatch):
    """run_cdc_merge_stream(views=[...]): derived aggregate views track
    the stream; a crash BETWEEN the merge commit and the view refresh
    self-heals on replay (the skipped batch still refreshes views); the
    in-stream refresh keeps view lag at zero so the maintain cadence's
    expire can never strand a view mark; in-place mode rejects views."""
    import os

    import lambda_kafka_to_s3_parquet_spark.operators.ivm as ivm_mod
    from lambda_kafka_to_s3_parquet_spark.operators.cdc import (
        run_cdc_merge_stream,
    )

    rows = [(u, _ts(f"2024-03-0{v + 1} 00:00:00"), "c",
             f"g{(u + v) % 3}", (u + 1) * 10 + v)
            for u in range(6) for v in range(3)]
    changes = spark.createDataFrame(
        rows, "k long, ts_s string, op string, g string, val long"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "op", "g", "val")
    src = tmp_path / "src"
    src.mkdir()
    for u in range(6):  # one user per batch: every batch moves groups
        staged = tmp_path / f"stage{u}"
        changes.filter(F.col("k") == u).coalesce(1).write.parquet(str(staged))
        part = next(f for f in os.listdir(staged) if f.startswith("part-"))
        dst = src / f"batch-{u}.parquet"
        os.rename(staged / part, dst)
        os.utime(dst, (1_000_000_000 + u * 10, 1_000_000_000 + u * 10))

    schema = "k long, ts timestamp, op string, g string, val long"
    table, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    vw = str(tmp_path / "vw")
    vspec = [{"path": vw, "group_by": ["g"], "sums": ["val"], "n_buckets": 4,
              "maintain_live_commits": 3}]

    with pytest.raises(ValueError, match="snapshot change feed"):
        run_cdc_merge_stream(spark, str(src), schema, table, ckpt,
                             keys=["k"], ts_col="ts", tiebreak="val",
                             commit_protocol="inplace", views=vspec)

    # crash the FIRST delta refresh (after the merge already committed)
    real = ivm_mod.incremental_view_refresh
    state = {"armed": True}

    def crashing(*a, **k):
        r = real(*a, **k)
        if state["armed"] and r["mode"] == "delta":
            state["armed"] = False
            raise RuntimeError("injected crash after merge, mid-refresh")
        return r

    monkeypatch.setattr(ivm_mod, "incremental_view_refresh", crashing)
    q = run_cdc_merge_stream(spark, str(src), schema, table, ckpt,
                             keys=["k"], ts_col="ts", tiebreak="val",
                             max_files_per_trigger=1,
                             commit_protocol="snapshot",
                             maintain_live_commits=3, views=vspec)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(300)
        raise RuntimeError(q.exception() or "stream did not fail")

    monkeypatch.setattr(ivm_mod, "incremental_view_refresh", real)
    q2 = run_cdc_merge_stream(spark, str(src), schema, table, ckpt,
                              keys=["k"], ts_col="ts", tiebreak="val",
                              max_files_per_trigger=1,
                              commit_protocol="snapshot",
                              maintain_live_commits=3, views=vspec)
    assert q2.awaitTermination(300)

    got = {(r["g"],): (r["n_rows"], r["sum_val"])
           for r in read_view(spark, vw).collect()}
    want = {
        (r["g"],): (r["n_rows"], r["sum_val"])
        for r in snapshot_read(spark, table)
        .groupBy("g")
        .agg(F.count("*").alias("n_rows"), F.sum("val").alias("sum_val"))
        .collect()
    }
    assert got == want
    assert sum(n for n, _ in got.values()) == 6  # one state row per user
    # the view's OWN commit history is bounded by its maintain cadence
    # (one refresh commit per micro-batch would otherwise grow forever)
    from lambda_kafka_to_s3_parquet_spark.operators.snapshots import (
        _load_manifest,
    )

    m = _load_manifest(spark, vw, current_version(spark, vw))
    live = {
        d.split("/")[1]
        for dirs in m["partitions"].values()
        for d in dirs
    }
    assert len(live) <= 3


def test_view_retracts_across_delete_where_commit(spark, tmp_path):
    """snapshot_delete_where on the maintained source emits exact delete
    images in the change feed, so the next poll retracts the deleted
    rows from the view — no rescan, equal to the direct aggregate
    (round-11 predicate-delete integration)."""
    from lambda_kafka_to_s3_parquet_spark.operators.snapshots import (
        snapshot_delete_where,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    _merge(spark, src, [
        (1, _ts("2024-01-01 00:00:00"), "c", "a", 10),
        (2, _ts("2024-01-01 00:00:00"), "c", "a", 20),
        (3, _ts("2024-01-01 00:00:00"), "c", "b", 30),
        (4, _ts("2024-01-01 00:00:00"), "c", "b", 40),
    ])
    incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    # GDPR-style predicate delete straight on the snapshot source
    snapshot_delete_where(spark, src, "k = 2 OR val >= 40")
    r = incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert r["mode"] == "delta"
    got = _got(spark, view)
    assert got == _direct(spark, src) == {("a",): (1, 10), ("b",): (1, 30)}


def test_view_refreshes_across_merge_commit(spark, tmp_path):
    """snapshot_merge_into emits exact insert/delete/update images in
    the change feed, so an IVM view applies a MERGE with signed
    multiplicity and no rescan — update-mode and delete-mode merges both
    land, equal to the direct aggregate (round-11 MERGE integration)."""
    from lambda_kafka_to_s3_parquet_spark.operators.snapshots import (
        snapshot_append,
        snapshot_merge_into,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snapshot_append(
        spark, src,
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
            "k long, g string, val long",
        ),
    )
    incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    # update-mode merge: update k=2 (a: 20 -> 200), insert k=4 into b
    snapshot_merge_into(
        spark, src,
        spark.createDataFrame(
            [(2, "a", 200), (4, "b", 40)], "k long, g string, val long"
        ),
        ["k"],
    )
    r = incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert r["mode"] == "delta"
    assert _got(spark, view) == _direct(spark, src) == {
        ("a",): (2, 210), ("b",): (2, 70)
    }
    # delete-mode merge: retract k=1 (a loses a row) via the same feed
    snapshot_merge_into(
        spark, src,
        spark.createDataFrame([(1, "a", 0)], "k long, g string, val long"),
        ["k"], when_matched="delete", when_not_matched=None,
    )
    r = incremental_view_refresh(spark, src, view, ["k"], ["g"], ["val"])
    assert r["mode"] == "delta"
    assert _got(spark, view) == _direct(spark, src) == {
        ("a",): (1, 200), ("b",): (2, 70)
    }
