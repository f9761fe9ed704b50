"""PageRank — hand-checked micro-graphs (fixture-scale values are
pinned by the `pagerank` differential oracle)."""

from __future__ import annotations

from pyspark.sql import Row

from nyctaxidatapipeline_spark.operators.graph import pagerank, top_ranked


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_two_node_cycle_is_stationary(spark):
    # symmetric 2-cycle: 1/2 each is the fixed point and survives
    # rounding at every iteration
    e = _edges(spark, [("a", "b"), ("b", "a")])
    out = {r["node"]: r["rank"] for r in pagerank(e, iters=4).collect()}
    assert out == {"a": 0.5, "b": 0.5}


def test_star_sink_collects_rank(spark):
    # a -> c, b -> c: after 1 iteration c = (1-d)/3 + d*(1/3 + 1/3);
    # a and b have no in-edges -> (1-d)/3. No dangling redistribution.
    e = _edges(spark, [("a", "c"), ("b", "c")])
    out = {r["node"]: r["rank"]
           for r in pagerank(e, iters=1, damping=0.85).collect()}
    third = round(1.0 / 3, 6)
    assert out["a"] == out["b"] == round(0.15 / 3, 6)
    assert out["c"] == round(0.15 / 3 + 0.85 * round(2 * third, 6), 6)
    assert out["c"] > out["a"]


def test_more_inlinks_rank_higher(spark):
    # hub-and-spoke: everyone links to h, h links back to a only
    pairs = [(x, "h") for x in "abcd"] + [("h", "a")]
    out = {r["node"]: r["rank"]
           for r in pagerank(_edges(spark, pairs), iters=5).collect()}
    assert out["h"] == max(out.values())
    assert out["a"] > out["b"] == out["c"] == out["d"]


def test_top_ranked_deterministic_cut(spark):
    pairs = [(x, "h") for x in "abcd"] + [("h", "a")]
    rows = top_ranked(_edges(spark, pairs), k=3, iters=5).collect()
    assert [r["node"] for r in rows] == ["h", "a", "b"]  # b<c<d tie->id
