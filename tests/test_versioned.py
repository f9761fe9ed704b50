"""Versioned parquet tables — snapshot isolation, time travel,
rollback, crash invisibility, and manifest-stats file pruning."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.versioned import (
    read_version,
    rollback,
    table_versions,
    write_version,
)


def _df(spark, lo, hi):
    return spark.createDataFrame([Row(k=i, s=f"s{i}")
                                  for i in range(lo, hi)])


def test_append_overwrite_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = write_version(_df(spark, 0, 10), t, mode="overwrite")
    v2 = write_version(_df(spark, 10, 15), t, mode="append")
    v3 = write_version(_df(spark, 100, 103), t, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert table_versions(t) == [1, 2, 3]
    # latest = the overwrite
    assert sorted(r.k for r in read_version(spark, t).collect()) == \
        [100, 101, 102]
    # time travel: v2 is the union, v1 the original
    assert sorted(r.k for r in
                  read_version(spark, t, 2).collect()) == list(range(15))
    assert sorted(r.k for r in
                  read_version(spark, t, 1).collect()) == list(range(10))


def test_rollback_is_nondestructive(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(_df(spark, 0, 5), t)
    write_version(_df(spark, 5, 9), t, mode="overwrite")
    v = rollback(spark, t, 1)
    assert v == 3 and table_versions(t) == [1, 2, 3]
    assert sorted(r.k for r in read_version(spark, t).collect()) == \
        list(range(5))
    # the rolled-over version is still readable
    assert sorted(r.k for r in read_version(spark, t, 2).collect()) == \
        [5, 6, 7, 8]


def test_uncommitted_data_is_invisible(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(_df(spark, 0, 4), t)
    # simulate a crashed writer: data files land, no manifest
    dead = os.path.join(t, "data", "v00099")
    _df(spark, 900, 950).write.parquet(dead)
    assert table_versions(t) == [1]
    assert sorted(r.k for r in read_version(spark, t).collect()) == \
        [0, 1, 2, 3]


def test_append_carries_parent_entries_without_restat(spark, tmp_path):
    import json

    t = str(tmp_path / "tbl")
    write_version(_df(spark, 0, 4), t, stat_cols=("k",))
    write_version(_df(spark, 4, 8), t, mode="append", stat_cols=("k",))
    with open(os.path.join(t, "_versions", "2.json")) as fh:
        m = json.load(fh)
    files = [e["file"] for e in m["entries"]]
    assert any(f.startswith("data/v00001") for f in files)
    assert any(f.startswith("data/v00002") for f in files)
    # every entry has k stats and they bound the right halves
    for e in m["entries"]:
        lo, hi = e["stats"]["k"]
        assert (0 <= lo <= hi <= 3) or (4 <= lo <= hi <= 7)


def test_stats_pruning_skips_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # range-cluster on k so file stats are disjoint -> prunable
    big = spark.createDataFrame([Row(k=i, v=i * 2) for i in range(400)])
    clustered = big.repartitionByRange(8, "k")
    write_version(clustered, t, mode="overwrite", stat_cols=("k",))
    full = read_version(spark, t)
    assert len(full.inputFiles()) == 8
    pruned = read_version(spark, t, prune=("k", 100, 120))
    assert 0 < len(pruned.inputFiles()) < 8
    # pruning is sound: filter on the pruned read == filter on full
    want = sorted(r.k for r in
                  full.filter(F.col("k").between(100, 120)).collect())
    got = sorted(r.k for r in
                 pruned.filter(F.col("k").between(100, 120)).collect())
    assert got == want == list(range(100, 121))


def test_pruning_keeps_files_without_stats(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(_df(spark, 0, 10), t, stat_cols=())  # no stats
    pruned = read_version(spark, t, prune=("k", 3, 4))
    # conservative: nothing to prune on -> full read
    assert sorted(r.k for r in pruned.collect()) == list(range(10))


def test_concurrent_writer_loses_instead_of_clobbering(spark, tmp_path):
    from nyctaxidatapipeline_spark.versioned import (
        ConcurrentWriteError,
        _commit_manifest,
        _load_manifest,
    )

    t = str(tmp_path / "tbl")
    write_version(_df(spark, 0, 5), t, mode="overwrite")
    # Two writers that both read latest=1 race to commit version 2;
    # the loser must FAIL the hard-link CAS, not clobber the winner.
    _commit_manifest(t, 2, {"version": 2, "mode": "overwrite",
                            "stat_cols": [], "entries": [],
                            "writer": "winner"})
    try:
        _commit_manifest(t, 2, {"version": 2, "mode": "overwrite",
                                "stat_cols": [], "entries": [],
                                "writer": "loser"})
        raise AssertionError("second writer should have failed the CAS")
    except ConcurrentWriteError:
        pass
    # the winner's manifest is intact, no tmp litter remains
    assert _load_manifest(t, 2)["writer"] == "winner"
    vd = os.path.join(t, "_versions")
    assert not [f for f in os.listdir(vd) if f.startswith(".")]


def test_concurrent_write_version_data_race(spark, tmp_path,
                                            monkeypatch):
    """Two write_version callers racing on the same next version: the
    loser must fail the CAS *without having touched the winner's data
    files*. (Regression: a shared deterministic data dir let the
    loser's mode('overwrite') write delete the winner's committed
    parquet before the manifest CAS even ran.)"""
    import nyctaxidatapipeline_spark.versioned as V

    t = str(tmp_path / "tbl")
    write_version(_df(spark, 0, 5), t, mode="overwrite")
    # Writer A commits version 2 normally.
    write_version(_df(spark, 10, 15), t, mode="overwrite")
    # Writer B read latest=1 BEFORE A committed (stale snapshot): force
    # that interleaving by pinning table_versions to [1] inside B's
    # write_version call only.
    real = V.table_versions
    monkeypatch.setattr(V, "table_versions", lambda p: [1])
    try:
        write_version(_df(spark, 900, 905), t, mode="overwrite")
        raise AssertionError("stale writer should have lost the CAS")
    except V.ConcurrentWriteError:
        pass
    finally:
        monkeypatch.setattr(V, "table_versions", real)
    # The winner's committed version 2 is fully intact and readable —
    # every file its manifest references still exists.
    m = V._load_manifest(t, 2)
    for e in m["entries"]:
        assert os.path.exists(os.path.join(t, e["file"]))
    assert sorted(r.k for r in read_version(spark, t, 2).collect()) == \
        [10, 11, 12, 13, 14]


def test_schema_evolution_merge_read(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(_df(spark, 0, 5), t, mode="overwrite")
    evolved = _df(spark, 5, 8).withColumn("extra", F.col("k") * 10)
    write_version(evolved, t, mode="append")
    # widened read: old files surface NULL for the added column
    out = read_version(spark, t, merge_schema=True)
    assert set(out.columns) == {"k", "s", "extra"}
    rows = {r.k: r.extra for r in out.collect()}
    assert len(rows) == 8
    assert all(rows[k] is None for k in range(5))
    assert all(rows[k] == k * 10 for k in range(5, 8))
    # time travel to v1 still reads the ORIGINAL schema
    assert set(read_version(spark, t, version=1).columns) == {"k", "s"}
