"""Plan-invariant sweep over EVERY registered query: the scale
properties the per-operator docstrings promise, asserted mechanically
so a regression in any future change is caught by pytest instead of a
by-hand explain audit.

Invariants:
  * no CartesianProduct anywhere;
  * BroadcastNestedLoopJoin only where a deliberately-broadcast
    scalar/tiny frame enters a projection (the 1-row bounds/threshold
    pattern) — never between two data-sized sides (approximated: at
    most two BNLJs per plan — several queries legitimately broadcast
    two scalar frames, e.g. a total and a vocabulary size);
  * no row-at-a-time Python (BatchEvalPython); Arrow-batched pandas
    ops only in the explicitly whitelisted kernels.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from nyctaxidatapipeline_spark.plans import explain_str

SF = "/root/testdata/sf0.001"

#: queries allowed an Arrow-batched pandas kernel — the documented BLAS
#: wins plus the multimodal decode zone (real codecs run in Python by
#: design; media synthesis + decode are both mapInPandas stages there)
ARROW_OK = {"embedding_near_dup", "image_features", "frame_sample",
            "frame_sample_avi", "audio_features"}


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


def test_bnlj_only_for_scalar_broadcasts(plans):
    # the 1-row bounds/threshold/total pattern produces exactly one
    # BroadcastNestedLoopJoin; two or more would mean a data-sized
    # non-equi join slipped in
    bad = [n for n, p in plans.items()
           if p.count("BroadcastNestedLoopJoin") > 2]
    assert not bad, f"suspicious BNLJ stacks in: {bad}"
