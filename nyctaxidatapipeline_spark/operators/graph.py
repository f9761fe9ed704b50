"""Graph operators over edge-list DataFrames: PageRank.

Web-corpus curation ranks pages/domains by link authority (Common Crawl
releases harmonic/PageRank centrality per domain; quality filters use it
as a prior), and the same primitive ranks any entity graph an analytics
user has lying around. Companion to ``dedup.connected_components`` (the
other standard edge-list algorithm in this engine).

Formulation: the classic power iteration
    rank'(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank(u) / outdeg(u)
with a fixed iteration count. Dangling mass is NOT redistributed (the
simple formulation — a node with no out-edges just stops contributing);
the oracle twin defines the same semantics, so the differential gate
pins it.

Determinism discipline: every rank is rounded to 6 dp at every
iteration boundary — in-neighbor sums are floating-point and
order-sensitive, so without the per-round rounding, ulp drift would
compound across iterations and the cross-engine value hash would flake.
All scalars ((1-d)/N, the initial 1/N) are computed IN-ENGINE with
Spark's ROUND (half-away-from-zero, matching DuckDB) — not with
Python's ``round`` (half-to-even).

Scale shape (100 TB edge lists): the out-degree-annotated edge table is
built once, hash-partitioned by src, and pinned (localCheckpoint) — the
Pregel-on-dataframes equivalent of persisting the partitioned edge
table. Each iteration is then exactly ONE shuffle (the contribution
aggregate by dst): the edges⋈ranks join reuses the pinned src
partitioning and only moves the ranks side, and the nodes⋈sums join
reuses the node-set partitioning. ``checkpoint_every`` truncates the
ranks lineage every ~2 rounds so deep iteration counts don't grow the
plan superlinearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 3, damping: float = 0.85,
             checkpoint_every: int = 2) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Output: (node, rank) for every node appearing as src or dst.
    Duplicate edges contribute once each — pre-``distinct()`` the input
    if multi-edges should not add weight.

    ``checkpoint_every`` truncates the ranks lineage mid-loop; each
    un-checkpointed round nests another join+agg into ONE plan, and at
    deep iteration counts Catalyst's analysis/optimization time on that
    nested plan grows superlinearly (the classic iterative-algorithm
    trap). The default fires every 2 rounds, so it engages even at the
    default ``iters=3``; a 20-iteration run is regression-tested for
    bounded wall-clock in ``tests/test_graph.py``.
    """
    # Materialize the loop invariants ONCE: the edge table, node set,
    # and out-degrees are referenced by every iteration, and Spark's
    # lazy evaluation would otherwise replay the upstream edge
    # derivation (scan + distinct + ...) once per reference per round —
    # measured 3-4x the whole query's cost at 3 iterations.
    # localCheckpoint truncates their lineage and pins the computed
    # partitions (the single-query equivalent of persisting the
    # partitioned edge table). Two layout choices keep each iteration
    # at EXACTLY ONE shuffle (the contribution aggregate by dst):
    #   * out-degree is folded into the edge table before the loop —
    #     the per-round edges⋈outdeg join would otherwise repeat
    #     identical work every iteration;
    #   * the folded edge table is hash-partitioned by src and the
    #     node set by node BEFORE checkpointing, so the per-round
    #     joins (edges⋈ranks on src; nodes⋈sums on node) reuse the
    #     pinned partitioning — only the ranks/sums side moves.
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
              .localCheckpoint(eager=False))
    outdeg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    ew = (e.repartition(F.col("src"))
           .join(outdeg, "src")
           .localCheckpoint(eager=False))
    nodes = (e.select(F.col("src").alias("node"))
              .union(e.select(F.col("dst").alias("node")))
              .distinct()
              .localCheckpoint(eager=False))
    n1 = F.broadcast(nodes.agg(F.count("*").alias("_n")))
    ranks = (nodes.crossJoin(n1)
             .select("node", F.round(1.0 / F.col("_n"), 6).alias("rank")))
    for i in range(iters):
        contribs = (ew.join(ranks.withColumnRenamed("node", "src"), "src")
                      .select("dst", (F.col("rank") / F.col("_deg"))
                              .alias("_c")))
        sums = (contribs.groupBy("dst")
                        .agg(F.round(F.sum("_c"), 6).alias("_s")))
        ranks = (nodes.join(sums.withColumnRenamed("dst", "node"),
                            "node", "left")
                 .crossJoin(n1)
                 .select("node",
                         F.round((1.0 - damping) / F.col("_n")
                                 + damping * F.coalesce(F.col("_s"),
                                                        F.lit(0.0)),
                                 6).alias("rank")))
        if checkpoint_every and (i + 1) % checkpoint_every == 0 \
                and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def top_ranked(edges: DataFrame, k: int = 20, **kwargs) -> DataFrame:
    """Top-k nodes by PageRank (ties broken by node id for a
    deterministic cut)."""
    r = pagerank(edges, **kwargs)
    return (r.orderBy(F.col("rank").desc(), F.col("node"))
             .limit(k))
