"""Executed-plan metric collection (tools/plan_metrics.py): the census
must read the REAL executed values off the dataframe's own
QueryExecution — the regression this pins is silently-zero metrics
(executing a different QueryExecution, walking the initial instead of
the AQE-final plan, or missing QueryStageExec subtrees)."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

from plan_metrics import collect_metrics  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_scan_and_shuffle_metrics_populated(spark):
    df = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")))
    m = collect_metrics(df)
    assert m["scan_rows"] > 0
    assert m["input_bytes"] > 0
    assert m["shuffle_write_bytes"] > 0          # partial->final agg
    assert m["shuffle_records"] <= m["scan_rows"]  # map-side combine
    assert m["spill_bytes"] == 0
    assert m["compute_nodes"] >= 4


def test_codegen_coverage_bounds_and_nonzero(spark):
    df = (spark.read.parquet(f"{SF}/orders.parquet")
          .filter(F.col("o_totalprice") > 10)
          .groupBy("o_orderstatus").count())
    m = collect_metrics(df)
    assert 0 < m["codegen_nodes"] <= m["compute_nodes"]


def test_broadcast_join_measured_not_shuffled(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    joined = (cust.join(F.broadcast(nat),
                        cust.c_nationkey == nat.n_nationkey)
                  .select("c_custkey", "n_name"))
    m = collect_metrics(joined)
    assert m["broadcast_bytes"] > 0
    # pure broadcast join plan: no shuffle exchange at all
    assert m["shuffle_write_bytes"] == 0


def test_ratios_cross_scale_report():
    from plan_metrics import ratios

    small = {"queries": {
        "a": {"input_bytes": 10, "shuffle_write_bytes": 100},
        "b": {"input_bytes": 10, "shuffle_write_bytes": 0},
        "err": {"error": "x"},
        "only_small": {"input_bytes": 1}}}
    big = {"queries": {
        "a": {"input_bytes": 100, "shuffle_write_bytes": 5000,
              "spill_bytes": 7},
        "b": {"input_bytes": 100, "shuffle_write_bytes": 50},
        "err": {"input_bytes": 1},
        "only_big": {"input_bytes": 1}}}
    rows = {r[0]: r for r in ratios(small, big)}
    # errored and one-sided queries are excluded
    assert set(rows) == {"a", "b"}
    name, sr, ir, spill = rows["a"]
    assert (sr, ir, spill) == (50.0, 10.0, 7)
    # zero small-side shuffle -> ratio undefined, not a crash
    assert rows["b"][1] is None

    # a spiller present at BOTH scales was already adjudicated — only
    # a NEW spill flags
    both = {"queries": {"a": {"input_bytes": 10,
                              "shuffle_write_bytes": 100,
                              "spill_bytes": 5}}}
    rows2 = {r[0]: r for r in ratios(both, big)}
    assert rows2["a"][3] == 0


def test_no_double_count_on_reused_exchange(spark):
    """A self-join on an aggregate reuses one exchange; the census must
    count its bytes once (node identity, not per reference)."""
    agg = (spark.read.parquet(f"{SF}/lineitem.parquet")
           .groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")))
    solo = collect_metrics(agg)
    both = collect_metrics(
        agg.alias("a").join(agg.alias("b"), "l_returnflag"))
    # the reused exchange contributes once, so the join's shuffle
    # traffic stays well under 2x the solo aggregate's (broadcast of
    # the tiny 3-row side adds no shuffle)
    assert both["shuffle_write_bytes"] < 2 * solo["shuffle_write_bytes"]


def test_flag_marks_new_shuffle_and_floors():
    """ADVICE r12: a zero-small-side shuffle (ratio None) must flag
    NEW-SHUFFLE when the big side exceeds the 2 MB floor — the
    broadcast→SMJ handover case the skip used to hide — and stay
    silent below the floor (final-aggregate framing noise)."""
    from plan_metrics import flag_marks

    assert flag_marks(None, 10.0, 0, 50_000_000) == ["NEW-SHUFFLE"]
    assert flag_marks(None, 10.0, 0, 50_000) == []
    assert flag_marks(50.0, 10.0, 0, 50_000_000) == ["SUPERLINEAR"]
    assert flag_marks(50.0, 10.0, 0, 50_000) == []
    assert flag_marks(10.0, 10.0, 7, 50_000_000) == ["NEW-SPILL"]
    assert flag_marks(None, 10.0, 7, 50_000_000) == ["NEW-SPILL",
                                                     "NEW-SHUFFLE"]
