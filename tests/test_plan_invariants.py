"""Plan-invariant sweep over EVERY registered query: the scale
properties the per-operator docstrings promise, asserted mechanically
so a regression in any future change is caught by pytest instead of a
by-hand explain audit.

Invariants:
  * no CartesianProduct anywhere;
  * BroadcastNestedLoopJoin only where a deliberately-broadcast
    scalar frame enters a projection (the 1-row bounds/threshold
    pattern) — never between two data-sized sides. Checked
    structurally via plans.data_sized_bnljs: the build side must be an
    IdentityBroadcastMode exchange over a keys=[] global aggregate, so
    composed queries may stack any number of scalar broadcasts while a
    single data-sized build side still fails;
  * no row-at-a-time Python (BatchEvalPython); Arrow-batched pandas
    ops only in the explicitly whitelisted kernels.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from nyctaxidatapipeline_spark.plans import data_sized_bnljs, explain_str

SF = "/root/testdata/sf0.001"

#: queries allowed an Arrow-batched pandas kernel — the documented BLAS
#: wins plus the multimodal decode zone (real codecs run in Python by
#: design; media synthesis + decode are both mapInPandas stages there)
ARROW_OK = {"embedding_near_dup", "image_features",
            "image_features_png_i7", "image_features_jpeg",
            "image_features_jpeg_prog", "image_features_gif",
            "image_dedup_dhash", "image_resize_png",
            "frame_sample", "frame_sample_avi", "frame_sample_h264",
            "audio_features",
            "audio_features_mp3", "warc_ingest", "webdataset_ingest",
            "jsonl_ingest",
            # TFRecord roundtrip: proto encode + frame (applyInPandas)
            # and unframe + proto decode (mapInPandas) are the
            # sanctioned codec zones, like the sibling ingest sources;
            # md5/length run JVM-side on the decoded columns.
            "tfrecord_ingest",
            "semantic_dedup_auto", "knn_graph_ivf",
            # BLAS routing passes of the auto-sized semantic admission
            # gate (the knn_graph_ivf kernels re-applied to admission);
            # the indexed twin routes only the BATCH (corpus read back
            # pre-routed from the persisted index)
            "incremental_semantic_auto",
            "incremental_semantic_auto_indexed"}

#: queries allowed a grouped pandas kernel (FlatMapGroupsInPandas /
#: applyInPandas) — the two block-pair BLAS kernels (kNN partial top-k
#: and the blocked near-dup's pair kernel). Kept separate from ARROW_OK
#: so a future row-group Python kernel cannot slip past the gate under
#: the mapInPandas whitelist.
GROUPED_PANDAS_OK = {"knn_graph", "knn_graph_ivf", "embedding_near_dup",
                     "semantic_dedup_auto",
                     # per-shard proto encode + framing (the pack side
                     # of the TFRecord codec zone)
                     "tfrecord_ingest",
                     # per-list BLAS verification of the auto-sized
                     # semantic admission gate (both persistence modes)
                     "incremental_semantic_auto",
                     "incremental_semantic_auto_indexed"}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in entrymod.queries().items():
        out[name] = explain_str(fn(spark, SF), "simple")
    return out


def test_no_cartesian_product(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian products in: {bad}"


def test_no_row_at_a_time_python(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDFs in: {bad}"
    bad = [n for n, p in plans.items()
           if ("ArrowEvalPython" in p or "MapInPandas" in p)
           and n not in ARROW_OK]
    assert not bad, f"unexpected pandas kernels in: {bad}"
    bad = [n for n, p in plans.items()
           if "FlatMapGroupsInPandas" in p and n not in GROUPED_PANDAS_OK]
    assert not bad, f"unexpected grouped pandas kernels in: {bad}"


def test_grouped_pandas_gate_catches_unlisted_kernel(spark):
    # Negative control: an applyInPandas plan NOT in GROUPED_PANDAS_OK
    # must trip the sweep — proving the FlatMapGroupsInPandas gate has
    # teeth (it is invisible to the ArrowEvalPython/MapInPandas checks).
    from nyctaxidatapipeline_spark.sources import read_parquet

    nation = read_parquet(spark, f"{SF}/nation.parquet")
    df = nation.groupBy("n_regionkey").applyInPandas(
        lambda pdf: pdf, schema=nation.schema)
    plan = explain_str(df, "simple")
    assert "FlatMapGroupsInPandas" in plan, (
        "fixture no longer plans applyInPandas as FlatMapGroupsInPandas; "
        "rewrite the negative control")


#: Queries whose plans carry BNLJs that are NOT the scalar-aggregate
#: shape but are still bounded — by operator CONTRACT rather than plan
#: structure — mapped to the exact number allowed. Anything beyond the
#: documented count fails, so a new data-sized BNLJ in these queries is
#: still caught.
BNLJ_CONTRACT_OK = {
    # Brute-force ANN / fusion: the build side is the QUERY SET
    # (Filter vec_id < n_queries over embeddings) — tiny by the
    # operator's contract (n_queries ≪ corpus); queries × corpus is the
    # definition of brute-force scoring, the baseline the LSH/IVF paths
    # exist to beat at scale.
    "ann_topk": 1,
    "ann_pq": 1,
    "rrf_fusion": 1,
    # Same brute-force contract, plus the label/id inequality filter
    # folded into the BNLJ condition: build side is the query set
    # (Filter vec_id < 10 over embeddings), queries ≪ corpus; the scale
    # path is the identical composition over ivf_topk candidates.
    "hard_negatives": 1,
    # Covariance: build sides select the single (i=-1, j=-1) count row
    # out of the d²-bounded moments frame — 1 row by construction, but
    # shaped as a sentinel Filter over ExistingRDD, not an aggregate.
    "embedding_covariance": 2,
    # KMV overlap: the inequality pair join (ga < gb) runs over the
    # SKETCH table — one row per group, each a k-bounded hash array
    # (O(groups x k) total, independent of corpus size by the sketch's
    # contract). The corpus itself never enters the join.
    "audience_overlap_kmv": 1,
}


def test_bnlj_only_for_scalar_broadcasts(plans):
    # Every BNLJ must be the 1-row bounds/threshold pattern: build side
    # = IdentityBroadcastMode exchange over a keys=[] (global) aggregate.
    # Composed queries (perplexity_buckets, curriculum_order) stack many
    # such scalar broadcasts legitimately — the count is unbounded, the
    # SHAPE is what matters: a data-sized build side is O(n·m) and fails
    # unless covered by the explicit BNLJ_CONTRACT_OK budget above.
    bad = {}
    for n, p in plans.items():
        flagged = data_sized_bnljs(p)
        if len(flagged) > BNLJ_CONTRACT_OK.get(n, 0):
            bad[n] = flagged
    assert not bad, f"data-sized BNLJ build sides in: {bad}"


def test_bnlj_checker_catches_data_sized_build(spark):
    # Negative control: a genuine data-sized nested-loop join (non-equi
    # condition between two real tables) must be flagged, proving the
    # scalar-broadcast whitelist above still has teeth.
    from nyctaxidatapipeline_spark.sources import read_parquet

    nation = read_parquet(spark, f"{SF}/nation.parquet")
    region = read_parquet(spark, f"{SF}/region.parquet")
    df = nation.join(region, nation.n_regionkey < region.r_regionkey)
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in plan, (
        "fixture no longer plans as BNLJ; rewrite the negative control")
    assert data_sized_bnljs(plan), (
        "checker failed to flag a data-sized BNLJ build side")
