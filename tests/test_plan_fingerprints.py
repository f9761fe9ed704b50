"""Plan-fingerprint normalizer: the properties that make the committed
PLAN_FINGERPRINTS.json artifact a usable drift witness.

The artifact's whole value is that a fingerprint is invariant to the
run-specific noise two otherwise-identical sessions produce (expression
id allocation, temp index directories, cached statistics) while still
changing whenever the plan structurally changes. Both directions are
pinned here on real Spark plans, not string fixtures.
"""

from __future__ import annotations

import re
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

from plan_fingerprints import (  # noqa: E402
    diff, fingerprint_df, normalize_plan, plan_features)

SF = "/root/testdata/sf0.001"


def _orders_agg(spark, sf_dir=SF):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (df.filter(F.col("o_totalprice") > 100.0)
            .groupBy("o_orderstatus")
            .agg(F.sum("o_totalprice").alias("revenue")))


def test_exprid_invariance(spark):
    """Same logical query built twice — with unrelated plans allocated
    in between so the second build's expression ids differ — must
    fingerprint identically."""
    h1, f1 = fingerprint_df(_orders_agg(spark))
    # Burn expression ids: analyze a few unrelated frames.
    for t in ("nation", "region", "customer"):
        spark.read.parquet(f"{SF}/{t}.parquet").schema  # noqa: B018
        spark.read.parquet(f"{SF}/{t}.parquet").select("*").columns  # noqa: B018
    h2, f2 = fingerprint_df(_orders_agg(spark))
    assert h1 == h2
    assert f1 == f2


def test_path_invariance(spark, tmp_path):
    """The same data written to two different temp directories must
    fingerprint identically — temp index/corpus dirs differ every run."""
    src = spark.read.parquet(f"{SF}/nation.parquet")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    src.write.parquet(a)
    src.write.parquet(b)
    ha, _ = fingerprint_df(spark.read.parquet(a).groupBy("n_regionkey").count())
    hb, _ = fingerprint_df(spark.read.parquet(b).groupBy("n_regionkey").count())
    assert ha == hb


def test_structural_change_changes_hash(spark):
    """The counter-direction: a real plan change (added filter reaching
    the scan, join vs no join) must change the hash."""
    base, _ = fingerprint_df(_orders_agg(spark))
    narrowed, _ = fingerprint_df(
        _orders_agg(spark).filter(F.col("revenue") > 0))
    assert base != narrowed


def test_features_census(spark):
    """Operator census counts NODES (tree section only) and sees pushed
    filters from the detail section."""
    _, feats = fingerprint_df(_orders_agg(spark))
    assert feats["scans"] == 1
    assert feats["hash_aggregates"] == 2  # partial + final
    assert feats["exchanges"] == 1
    assert feats.get("scans_with_pushed_filters", 0) >= 1

    joined = _orders_agg(spark).join(
        F.broadcast(spark.read.parquet(f"{SF}/nation.parquet")),
        F.col("o_orderstatus") == F.col("n_name"), "left")
    _, jf = fingerprint_df(joined)
    assert jf["broadcast_hash_joins"] == 1
    assert jf["broadcast_exchanges"] == 1


def test_diff_reports_changes():
    old = {"queries": {"a": {"hash": "x", "features": {"scans": 1}},
                       "b": {"hash": "y", "features": {}},
                       "gone": {"hash": "z", "features": {}}}}
    new = {"queries": {"a": {"hash": "x2", "features": {"scans": 2}},
                       "b": {"hash": "y", "features": {}},
                       "added": {"hash": "w", "features": {}}}}
    msgs = diff(old, new)
    assert any(m.startswith("a: HASH CHANGED") and "scans 1->2" in m
               for m in msgs)
    assert "added: ADDED" in msgs
    assert "gone: REMOVED" in msgs
    assert not any(m.startswith("b:") for m in msgs)
    assert diff(new, new) == []


def test_diff_reports_errors_and_sfdir_mismatch():
    """An errored side has no hash: None == None must not read as
    'unchanged', and hash-vs-None must not read as a plan change; the
    build failure itself is the message. A scale mismatch between the
    artifacts is named before the per-query noise."""
    ok = {"hash": "x", "features": {}}
    old = {"sf_dir": "/a", "queries": {
        "both": {"error": "KeyError: x"}, "newly": ok, "fine": ok}}
    new = {"sf_dir": "/a", "queries": {
        "both": {"error": "KeyError: x"},
        "newly": {"error": "ValueError: y"}, "fine": ok}}
    msgs = diff(old, new)
    assert any(m.startswith("both: BUILD ERROR (BOTH)") for m in msgs)
    assert any(m.startswith("newly: BUILD ERROR (NEW): ValueError: y")
               for m in msgs)
    assert not any(m.startswith("fine:") for m in msgs)
    assert not any("HASH CHANGED" in m for m in msgs)

    scaled = {"sf_dir": "/b", "queries": {"fine": ok}}
    msgs2 = diff({"sf_dir": "/a", "queries": {"fine": ok}}, scaled)
    assert msgs2 and msgs2[0].startswith("SF_DIR MISMATCH")


def test_normalizer_strips_volatiles():
    raw = ("HashAggregate(keys=[k#123L], functions=[sum(v#45)])\n"
           "Scan parquet [k#123L,v#45] Batched: true, "
           "Location: InMemoryFileIndex(1 paths)[file:/tmp/x9q/t.parquet], "
           "PushedFilters: [IsNotNull(v)]\n"
           "Statistics(sizeInBytes=12.3 KiB, rowCount=42)")
    norm = normalize_plan(raw)
    assert "#123" not in norm and "#45" not in norm
    assert "/tmp/x9q" not in norm
    assert "12.3 KiB" not in norm and "rowCount=42" not in norm
    assert "PushedFilters: [IsNotNull(v)]" in norm


def test_lambda_vars_renumbered_not_collapsed():
    """Higher-order-function lambda variables carry a session-global
    counter; normalization renumbers per-plan (first-appearance order)
    while keeping DISTINCT variables distinct."""
    a = ("transform(filter(c#1, lambdafunction(lambda x_350#2._keep, "
         "lambda x_350#2, false)), lambdafunction(lambda x_351#3.line, "
         "lambda x_351#3, false))")
    b = a.replace("x_350", "x_7").replace("x_351", "x_9")
    assert normalize_plan(a) == normalize_plan(b)
    assert "lambda x_0" in normalize_plan(a)
    assert "lambda x_1" in normalize_plan(a)
    # swapping which variable is referenced IS a change
    swapped = ("transform(filter(c#1, lambdafunction(lambda x_351#2._keep, "
               "lambda x_350#2, false)), lambdafunction(lambda x_350#3.line, "
               "lambda x_351#3, false))")
    assert normalize_plan(swapped) != normalize_plan(a)


def test_exprid_renumbered_not_collapsed():
    """ADVICE r12: expression ids are renumbered per-plan in
    first-appearance order, not collapsed to one token — so rewiring
    WHICH same-named attribute feeds an expression (two sides of a
    self-join, distinguished solely by exprId) changes the hash, while
    a pure allocation-offset shift does not."""
    a = ("Join Inner, (k#10L = k#20L)\n"
         "Project [k#10L, v#11]\n"
         "Project [k#20L, v#21]\n"
         "Filter (v#11 > 5)")
    # same plan, ids shifted by a session-global offset — shift the
    # WHOLE numeric token (ADVICE r13: naive str.replace("#1", "#31")
    # also rewrote #10L -> #310L / #11 -> #311, which only passed
    # because that collision happened to stay order-preserving)
    b = re.sub(r"#(\d+)", lambda m: f"#{int(m.group(1)) + 30}", a)
    assert normalize_plan(a) == normalize_plan(b)
    # rewire: the filter now reads the OTHER side's same-named column
    rewired = a.replace("Filter (v#11 > 5)", "Filter (v#21 > 5)")
    assert normalize_plan(rewired) != normalize_plan(a)
    # type-suffix letters belong to the id token, not the name
    assert "#e0" in normalize_plan(a) and "L" not in \
        normalize_plan(a).split("\n")[0].split("=")[0].split("(")[1]


def test_diff_accepts_bench_artifacts():
    """VERDICT r12 task 2: --diff coerces a bench artifact (identified
    by its `fingerprints` map) into fingerprint form, so a driver-run
    BENCH_rN.json self-adjudicates against PLAN_FINGERPRINTS.json."""
    fp = {"sf_dir": "/root/testdata/sf0.1",
          "queries": {"a": {"hash": "x", "features": {"scans": 1}},
                      "b": {"hash": "y", "features": {}}}}
    bench = {"metric": "total_query_sec", "value": 1.0,
             "sf_dir": "/root/testdata/sf0.1",
             "queries": {"a": 0.5, "b": 0.5},
             "fingerprints": {"a": "x", "b": "y2"}}
    msgs = diff(fp, bench)
    assert len(msgs) == 1 and msgs[0].startswith("b: HASH CHANGED")
    assert "no feature census on the bench side" in msgs[0]
    assert diff(bench, bench) == []
    # matching artifacts -> no differences
    bench["fingerprints"]["b"] = "y"
    assert diff(fp, bench) == []


def test_diff_routes_bench_error_sentinel():
    """r13 review finding 2: bench.py writes the string "error" when a
    query's fingerprint failed; the coercion must route it into the
    BUILD ERROR branch — two errored bench sides must NOT read as an
    unchanged plan, and error-vs-real-hash must NOT read as a plan
    change."""
    fp = {"sf_dir": "/x", "queries": {"a": {"hash": "h", "features": {}}}}
    bench_err = {"metric": "m", "sf_dir": "/x",
                 "queries": {"a": 1.0}, "fingerprints": {"a": "error"}}
    msgs = diff(fp, bench_err)
    assert len(msgs) == 1 and msgs[0].startswith("a: BUILD ERROR (NEW)")
    msgs2 = diff(bench_err, bench_err)
    assert len(msgs2) == 1 and "BUILD ERROR (BOTH)" in msgs2[0]
    assert not any("HASH CHANGED" in m for m in msgs + msgs2)
