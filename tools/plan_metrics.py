"""Executed-plan data-movement census: measured bytes, not guessed.

`PLAN_FINGERPRINTS.json` witnesses the STATIC plan; this tool executes
every registered query at the bench scale and reads the raw
``SQLMetric`` values off the AQE FINAL plan (py4j traversal — no UI,
no REST, no string parsing), recording per query:

  * ``input_bytes`` / ``scan_rows``   — files actually read (post
    partition-pruning) and rows surviving the scan;
  * ``shuffle_write_bytes`` / ``shuffle_records`` — total exchange
    traffic (the thing to MINIMIZE at 100 TB);
  * ``broadcast_bytes``               — build-side sizes actually
    broadcast (must stay bounded regardless of input scale);
  * ``spill_bytes``                   — operator spill (expected 0 at
    every test scale; nonzero means a partition no longer fits);
  * ``peak_memory_bytes``             — max single-operator peak;
  * ``codegen_nodes`` / ``compute_nodes`` — whole-stage-codegen
    coverage measured on the EXECUTED plan (the static fingerprint
    can't see it under AQE): compute nodes fused into a codegen span
    vs all compute nodes (Exchange/scan/Python nodes can never fuse;
    they count in the denominator deliberately — coverage is "how much
    of this query runs inside generated code", not "how much of the
    fusable part").

Execution forces the dataframe's OWN QueryExecution via
``queryExecution().toRdd().count()`` — same plan the bench runs, but
without driver-side row materialization, so big-output queries (dedup
survivors, curated corpora) don't bottleneck on py4j transfer.

The summary block totals the suite and lists the top shuffle writers
and any spillers. Shuffle/broadcast/spill metrics aggregate over each
plan NODE once (reused exchanges are counted at their definition, not
per reference).

Usage::

    python tools/plan_metrics.py                  # all queries, sf0.1
    python tools/plan_metrics.py --only a,b --sf-dir ... --out X.json
    python tools/plan_metrics.py --ratio SMALL.json BIG.json

Writes ``PLAN_METRICS.json`` (committed artifact) by default.

Reading a ``--ratio`` SUPERLINEAR flag (two-point ratios CANNOT
distinguish data growth from task-count growth): first check
``shuffle_records ≈ group_count × map_tasks`` — partial aggregates
emit one row per (group, task), so a scan that planned as 1 task at
the small scale and 31 at the big one inflates the ratio ×31 with
zero pathology (the r12 sf0.1→sf1 sweep flagged 19 queries; ALL
adjudicated to this law — PLANS.md #34). A flag that survives that
check (records outgrow groups×tasks, or bytes outgrow records) is a
real movement regression.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_OUT = os.path.join(_REPO, "PLAN_METRICS.json")

#: metric-name -> artifact field, summed over nodes
_SUM_FIELDS = {
    "filesSize": "input_bytes",
    "shuffleBytesWritten": "shuffle_write_bytes",
    "shuffleRecordsWritten": "shuffle_records",
    "spillSize": "spill_bytes",
}


def _iter_scala_map(jmap):
    it = jmap.iterator()
    while it.hasNext():
        kv = it.next()
        yield kv._1(), kv._2()


def _iter_scala_seq(jseq):
    it = jseq.iterator()
    while it.hasNext():
        yield it.next()


def collect_metrics(df) -> dict:
    """Execute ``df``'s own QueryExecution and walk the AQE final plan,
    aggregating SQLMetric values into the artifact fields."""
    qe = df._jdf.queryExecution()  # noqa: SLF001
    # NOT toJavaRDD()/rdd: Dataset.rdd silently builds a SEPARATE
    # rddQueryExecution (deserializer wrapper), leaving this one's
    # metrics at zero. toRdd() is THIS QueryExecution's internal-row
    # RDD; count() forces it without driver-side row materialization.
    qe.toRdd().count()
    root = qe.executedPlan()

    agg = {v: 0 for v in _SUM_FIELDS.values()}
    agg.update(broadcast_bytes=0, scan_rows=0, peak_memory_bytes=0,
               compute_nodes=0, codegen_nodes=0)
    seen: set[int] = set()

    def visit(node, in_codegen: bool) -> None:
        name = node.getClass().getSimpleName()
        node_id = node.id()
        new = node_id not in seen
        seen.add(node_id)

        if name == "WholeStageCodegenExec":
            in_codegen = True
        elif name == "InputAdapter":
            # children of an InputAdapter are OUTSIDE the codegen span
            in_codegen = False
        elif (not name.endswith("QueryStageExec") and new
              and name not in ("AdaptiveSparkPlanExec",
                               "ReusedExchangeExec",
                               "ReusedSubqueryExec")):
            # a compute node — the AQE root, reuse markers and the
            # codegen wrappers do no work and would deflate coverage
            agg["compute_nodes"] += 1
            if in_codegen:
                agg["codegen_nodes"] += 1

        if new:
            for k, m in _iter_scala_map(node.metrics()):
                v = m.value()
                if v <= 0:
                    continue
                if k in _SUM_FIELDS:
                    agg[_SUM_FIELDS[k]] += v
                elif k == "dataSize" and name == "BroadcastExchangeExec":
                    agg["broadcast_bytes"] += v
                elif k == "numOutputRows" and name.endswith("ScanExec"):
                    agg["scan_rows"] += v
                elif k == "peakMemory":
                    agg["peak_memory_bytes"] = max(agg["peak_memory_bytes"],
                                                   v)

        # descend: QueryStageExec holds its executed subtree in .plan(),
        # AdaptiveSparkPlanExec its final tree in .executedPlan(), and
        # expression subqueries (scalar/IN) hang off .subqueries() —
        # NOT children() — so skipping them would silently exclude
        # their scans and shuffles from the census
        if name == "AdaptiveSparkPlanExec":
            visit(node.executedPlan(), in_codegen)
        elif name.endswith("QueryStageExec"):
            visit(node.plan(), in_codegen)
        for child in _iter_scala_seq(node.children()):
            visit(child, in_codegen)
        for sq in _iter_scala_seq(node.subqueries()):
            visit(sq, False)

    visit(root, False)
    return agg


def stage_movement_totals(spark) -> dict[str, int]:
    """Cumulative stage-level movement counters from the
    AppStatusStore (VERDICT r12 task 4 — the SQLMetrics harvest in
    :func:`collect_metrics` can't attach to a streaming epoch because
    one ``foreachBatch`` epoch executes SEVERAL QueryExecutions plus
    state writes; the stage store sees them all). The listener bus is
    flushed first so an epoch's last jobs are counted in ITS snapshot,
    not the next one's. Per-epoch movement is the delta between two
    snapshots; a long-lived session should bump
    ``spark.ui.retainedStages`` so eviction cannot shrink the store
    mid-run — callers must treat a NEGATIVE delta as an invalid
    census, never as data. Moved here from ``bench_streaming.py``
    (r15) so the movement gate can import it without executing that
    script's ``sys.argv`` parsing under pytest."""
    sc = spark._jsc.sc()  # noqa: SLF001
    sc.listenerBus().waitUntilEmpty()
    store = sc.statusStore()
    jvm = spark._jvm  # noqa: SLF001
    gw = spark.sparkContext._gateway  # noqa: SLF001
    stages = store.stageList(jvm.java.util.ArrayList(), False, False,
                             gw.new_array(jvm.double, 0),
                             jvm.java.util.ArrayList())
    tot = {"input_bytes": 0, "shuffle_read_bytes": 0,
           "shuffle_write_bytes": 0, "spill_bytes": 0, "n_stages": 0}
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        tot["n_stages"] += 1
        tot["input_bytes"] += s.inputBytes()
        tot["shuffle_read_bytes"] += s.shuffleReadBytes()
        tot["shuffle_write_bytes"] += s.shuffleWriteBytes()
        tot["spill_bytes"] += (s.memoryBytesSpilled()
                               + s.diskBytesSpilled())
    return tot


def ratios(small: dict, big: dict) -> list[tuple]:
    """Per-query (shuffle_ratio, input_ratio, spill_flag) between two
    artifacts at different scales — the linearity check: an operator
    whose shuffle grows faster than its input is super-linear in data
    MOVEMENT even when its wall time still looks linear."""
    rows = []
    sq, bq = small.get("queries", {}), big.get("queries", {})
    for name in sorted(set(sq) & set(bq)):
        a, b = sq[name], bq[name]
        if "error" in a or "error" in b:
            continue
        si, bi = a.get("input_bytes", 0), b.get("input_bytes", 0)
        ss, bs = (a.get("shuffle_write_bytes", 0),
                  b.get("shuffle_write_bytes", 0))
        # NEW spill only: a spiller present at both scales was already
        # adjudicated when it first appeared; re-flagging it every run
        # trains readers to ignore the flag
        new_spill = (b.get("spill_bytes", 0)
                     if not a.get("spill_bytes", 0) else 0)
        rows.append((name,
                     round(bs / ss, 2) if ss else None,
                     round(bi / si, 2) if si else None,
                     new_spill))
    return rows


def flag_marks(sr: float | None, ir: float | None, spill: int,
               big_shuffle_bytes: int) -> list[str]:
    """Cross-scale movement flags for one query row (pure, unit-pinned).

    * ``NEW-SPILL`` — spill appeared at the big scale (spillers present
      at both scales were adjudicated when they first appeared).
    * ``NEW-SHUFFLE`` — the small-scale shuffle was ZERO so the ratio
      is undefined, and the big scale shuffles past the 2 MB floor
      (ADVICE r12: the old code skipped flagging on a None ratio
      entirely, hiding exactly the most extreme movement regression —
      a plan flipping pure-broadcast → large shuffle, e.g. an AQE
      broadcast→SMJ handover).
    * ``SUPERLINEAR`` — shuffle grew >1.5× faster than input. The 2 MB
      absolute floor matters for both shuffle marks: queries whose
      small-scale shuffle is a few KB of final aggregates measure
      mapper-count × framing overhead in the ratio, not data movement
      (tpch_q1's "31×" is 790 B → 24 KB).
    """
    marks = []
    if spill:
        marks.append("NEW-SPILL")
    if sr is None and big_shuffle_bytes > 2_000_000:
        marks.append("NEW-SHUFFLE")
    if (sr is not None and ir and sr > 1.5 * ir
            and big_shuffle_bytes > 2_000_000):
        marks.append("SUPERLINEAR")
    return marks


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default=DEFAULT_OUT)
    p.add_argument("--sf-dir",
                   default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                          "/root/testdata/sf0.1"))
    p.add_argument("--only", help="comma-separated query subset")
    p.add_argument("--skip", default="",
                   help="comma-separated queries to exclude (e.g. the "
                        "bench's sf>0.1 demotion set: the deliberately "
                        "quadratic exact-recall oracles)")
    p.add_argument("--ratio", nargs=2, metavar=("SMALL", "BIG"),
                   help="cross-scale report: per-query shuffle-bytes "
                        "and input-bytes growth between two artifacts, "
                        "flagging shuffle growing faster than input "
                        "(SUPERLINEAR), shuffle appearing from zero "
                        "(NEW-SHUFFLE), and any new spiller")
    args = p.parse_args()

    if args.ratio:
        with open(args.ratio[0]) as f:
            small = json.load(f)
        with open(args.ratio[1]) as f:
            big = json.load(f)
        flagged = 0
        bq = big.get("queries", {})
        for name, sr, ir, spill in ratios(small, big):
            marks = flag_marks(sr, ir, spill,
                               bq[name].get("shuffle_write_bytes", 0))
            flagged += bool(marks)
            tail = (" " + " ".join(marks)) if marks else ""
            print(f"{name}: shuffle x{sr} input x{ir}{tail}")
        print(f"{flagged} flagged")
        return 1 if flagged else 0

    sys.path.insert(0, _REPO)
    import __spark_entry__ as entrymod
    from nyctaxidatapipeline_spark import get_spark

    spark = get_spark("plan-metrics")
    qset = entrymod.queries()
    if args.only:
        names = [s.strip() for s in args.only.split(",") if s.strip()]
        unknown = [n for n in names if n not in qset]
        if unknown:
            p.error(f"unknown queries: {unknown} "
                    f"(registry has {len(qset)} entries)")
        qset = {n: qset[n] for n in names}
    if args.skip:
        skip = {s.strip() for s in args.skip.split(",")}
        qset = {n: fn for n, fn in qset.items() if n not in skip}

    out: dict[str, dict] = {}
    t0 = time.perf_counter()
    for name, fn in qset.items():
        try:
            m = collect_metrics(fn(spark, args.sf_dir))
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            out[name] = {"error": f"{type(exc).__name__}: {exc}"}
            continue
        m["codegen_coverage"] = (round(m["codegen_nodes"]
                                       / m["compute_nodes"], 3)
                                 if m["compute_nodes"] else 0.0)
        out[name] = {k: v for k, v in m.items() if v or k in (
            "input_bytes", "shuffle_write_bytes", "codegen_coverage")}

    ok = {n: q for n, q in out.items() if "error" not in q}
    spillers = {n: q["spill_bytes"] for n, q in ok.items()
                if q.get("spill_bytes")}
    top_shuffle = sorted(ok.items(),
                         key=lambda kv: -kv[1].get("shuffle_write_bytes", 0))
    summary = {
        "total_input_bytes": sum(q.get("input_bytes", 0)
                                 for q in ok.values()),
        "total_shuffle_write_bytes": sum(q.get("shuffle_write_bytes", 0)
                                         for q in ok.values()),
        "total_broadcast_bytes": sum(q.get("broadcast_bytes", 0)
                                     for q in ok.values()),
        "spillers": spillers,
        "top_shuffle_writers": {n: q.get("shuffle_write_bytes", 0)
                                for n, q in top_shuffle[:10]},
        "mean_codegen_coverage": round(
            sum(q["codegen_coverage"] for q in ok.values()) / len(ok), 3)
        if ok else 0.0,
    }
    art = {"sf_dir": args.sf_dir, "n_queries": len(out),
           "wall_sec": round(time.perf_counter() - t0, 1),
           "summary": summary, "queries": dict(sorted(out.items()))}
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
        f.write("\n")
    errs = {n: q["error"] for n, q in out.items() if "error" in q}
    print(f"wrote {len(out)} metric rows to {args.out} in "
          f"{art['wall_sec']}s ({len(errs)} errors); "
          f"spillers={list(spillers) or 'none'}; "
          f"mean codegen coverage={summary['mean_codegen_coverage']}")
    for n, e in errs.items():
        print(f"  ERROR {n}: {e}")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
