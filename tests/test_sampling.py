"""Deterministic sampling / dataset-split operators."""

import pytest
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    with_split,
)


def _ids(spark, n=500):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_split_is_total_and_stable_under_repartition(spark):
    df = _ids(spark)
    a = {r.doc_id: r.split
         for r in with_split(df, "doc_id").collect()}
    b = {r.doc_id: r.split
         for r in with_split(df.repartition(7), "doc_id").collect()}
    assert a == b  # label is a pure function of the key
    assert set(a.values()) <= {"train", "val", "test"}
    assert None not in a.values()  # 80+10+10 covers every bucket


def test_split_fractions_roughly_match(spark):
    counts = dict(with_split(_ids(spark, 2000), "doc_id")
                  .groupBy("split").count()
                  .rdd.map(lambda r: (r["split"], r["count"])).collect())
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert 0.05 < counts["val"] / 2000 < 0.15
    assert 0.05 < counts["test"] / 2000 < 0.15


def test_split_remainder_is_held_out_null(spark):
    labels = {r.split
              for r in with_split(_ids(spark), "doc_id",
                                  [("train", 50)]).collect()}
    assert labels == {"train", None}


def test_split_over_100_raises(spark):
    with pytest.raises(ValueError):
        with_split(_ids(spark), "doc_id", [("a", 60), ("b", 60)])


def test_sample_stable_and_append_consistent(spark):
    # the sample of a superset restricted to the subset == sample of the
    # subset: appending data never changes old rows' membership.
    small = {r.doc_id for r in
             deterministic_sample(_ids(spark, 300), "doc_id", 0.3).collect()}
    big = {r.doc_id for r in
           deterministic_sample(_ids(spark, 600), "doc_id", 0.3).collect()}
    assert small == {i for i in big if i < 300}
    assert 0.2 < len(small) / 300 < 0.4


def test_hash_bucket_matches_hashlib_md5(spark):
    import hashlib
    rows = (_ids(spark, 50)
            .select("doc_id", hash_bucket(F.col("doc_id")).alias("b"))
            .collect())
    for r in rows:
        exp = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8],
                  16) % 100
        assert r.b == exp


def test_stratified_sample_rates_and_determinism(spark):
    from nyctaxidatapipeline_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "xx"))
         for i in range(4000)], ["doc_id", "lang"])
    out = stratified_sample(df, "doc_id", "lang",
                            {"en": 0.25, "de": 1.0},
                            default_fraction=0.0)
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    # de keeps everything, the default stratum keeps nothing
    assert len(by_lang.get("de", set())) == 1000
    assert "xx" not in by_lang
    # en keeps ~25% (hash-uniform; generous tolerance at n=2000)
    n_en = len(by_lang.get("en", set()))
    assert 350 < n_en < 650
    # deterministic: a second evaluation returns the identical id set
    again = {r.doc_id for r in
             stratified_sample(df, "doc_id", "lang",
                               {"en": 0.25, "de": 1.0}).collect()
             if r.lang == "en"}
    assert again == by_lang["en"]
    # survival is a pure function of the key: the kept en-ids are exactly
    # those below the hash threshold, independent of other rows
    from nyctaxidatapipeline_spark.operators.sampling import hash_bucket
    from pyspark.sql import functions as F
    thr = {r.doc_id for r in
           df.filter((F.col("lang") == "en")
                     & (hash_bucket(F.col("doc_id"), 1_000_000)
                        < 250_000)).collect()}
    assert thr == by_lang["en"]


def test_stratified_sample_rejects_bad_fraction(spark):
    import pytest

    from nyctaxidatapipeline_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    with pytest.raises(ValueError):
        stratified_sample(df, "doc_id", "lang", {"en": 1.5})


def test_mix_sources_quotas_and_stability(spark):
    import pytest
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.sampling import mix_sources

    rows = [Row(id=f"{s}-{i}", src=s)
            for s, n in (("a", 40), ("b", 20), ("c", 100))
            for i in range(n)]
    df = spark.createDataFrame(rows)
    out = mix_sources(df, "src", "id", {"a": 0.5, "b": 0.25, "c": 0.25})
    got = {r["src"]: 0 for r in out.collect()}
    for r in out.collect():
        got[r["src"]] += 1
    # budget = min(40/.5, 20/.25, 100/.25) = 80 -> quotas 40/20/20
    assert got == {"a": 40, "b": 20, "c": 20}
    # append-stability: growing ONE source never changes others' picks
    bigger = df.unionByName(spark.createDataFrame(
        [Row(id=f"c-extra{i}", src="c") for i in range(100)]))
    out2 = mix_sources(bigger, "src", "id",
                       {"a": 0.5, "b": 0.25, "c": 0.25})
    picks_a = lambda o: {r["id"] for r in o.collect() if r["src"] == "a"}
    assert picks_a(out) == picks_a(out2)
    with pytest.raises(ValueError, match="sum to"):
        mix_sources(df, "src", "id", {"a": 0.5})
    with pytest.raises(ValueError, match="absent"):
        mix_sources(df, "src", "id", {"a": 0.5, "zzz": 0.5})


def test_cap_per_group_deterministic(spark):
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [Row(id=f"{g}-{i}", g=g) for g in ("a", "b") for i in range(30)]
        + [Row(id="c-0", g="c")])
    out = cap_per_group(df, ["g"], "id", 5)
    got = {}
    for r in out.collect():
        got[r["g"]] = got.get(r["g"], 0) + 1
    assert got == {"a": 5, "b": 5, "c": 1}  # undersized group intact
    # same survivors under repartition
    ids1 = {r["id"] for r in out.collect()}
    ids2 = {r["id"] for r in
            cap_per_group(df.repartition(7), ["g"], "id", 5).collect()}
    assert ids1 == ids2


# --- importance resampling ------------------------------------------------

def test_weighted_sample_extremes_and_determinism(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from nyctaxidatapipeline_spark.operators.sampling import (
        weighted_sample,
    )
    df = spark.createDataFrame(
        [Row(k=i, w=1.0) for i in range(200)]
        + [Row(k=1000 + i, w=0.0) for i in range(200)]
        + [Row(k=2000 + i, w=-0.5) for i in range(50)])
    out = weighted_sample(df, "k", "w")
    kept = {r.k for r in out.collect()}
    # weight 1 -> certainty; weight <= 0 -> dropped
    assert kept == set(range(200))
    # deterministic under repartition
    kept2 = {r.k for r in weighted_sample(df.repartition(7), "k", "w")
             .collect()}
    assert kept2 == kept


def test_weighted_sample_rate_tracks_weight(spark):
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.sampling import (
        weighted_sample,
    )
    df = spark.createDataFrame([Row(k=i, w=0.25) for i in range(4000)])
    n = weighted_sample(df, "k", "w").count()
    assert 800 <= n <= 1200, n       # ~25% of 4000


class TestNegativeSamples:
    """sampling.negative_samples — deterministic contrastive draws."""

    def _df(self, spark, n=30):
        return spark.range(n).withColumnRenamed("id", "doc_id")

    def test_shape_and_no_self(self, spark):
        from nyctaxidatapipeline_spark.operators.sampling import (
            negative_samples,
        )
        rows = negative_samples(self._df(spark), "doc_id", k=3).collect()
        assert len(rows) == 30 * 3
        assert all(r["anchor_id"] != r["negative_id"] for r in rows)
        assert all(0 <= r["negative_id"] < 30 for r in rows)
        per = {}
        for r in rows:
            per.setdefault(r["anchor_id"], set()).add(r["j"])
        assert all(js == {0, 1, 2} for js in per.values())

    def test_repartition_deterministic(self, spark):
        from nyctaxidatapipeline_spark.operators.sampling import (
            negative_samples,
        )
        df = self._df(spark, 50)
        a = sorted(map(tuple, negative_samples(df, "doc_id", 2).collect()))
        b = sorted(map(tuple,
                       negative_samples(df.repartition(7), "doc_id",
                                        2).collect()))
        assert a == b


def test_curriculum_order_levels_then_shuffle(spark):
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.sampling import (
        curriculum_order,
    )

    rows = [Row(doc_id=i, lvl=i % 3) for i in range(60)]
    df = spark.createDataFrame(rows)
    out = curriculum_order(df, "lvl", "doc_id").collect()
    # positions are a permutation of 1..n
    assert sorted(r.pos for r in out) == list(range(1, 61))
    by_pos = sorted(out, key=lambda r: r.pos)
    # levels are non-decreasing along the curriculum
    lvls = [r.lvl for r in by_pos]
    assert lvls == sorted(lvls)
    # within a level the md5 draw shuffles: not plain id order
    lvl0 = [r.doc_id for r in by_pos if r.lvl == 0]
    assert lvl0 != sorted(lvl0)
    # pure function of (level, id): repartition changes nothing
    out2 = curriculum_order(df.repartition(7), "lvl",
                            "doc_id").collect()
    assert {(r.doc_id, r.pos) for r in out2} == {(r.doc_id, r.pos)
                                                 for r in out}


def test_curriculum_order_rejects_out_of_range_level(spark):
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.sampling import (
        curriculum_order,
    )

    df = spark.createDataFrame([Row(doc_id=1, lvl=0),
                                Row(doc_id=2, lvl=8192)])
    try:
        curriculum_order(df, "lvl", "doc_id").collect()
        raise AssertionError("level 8192 should fail the packing guard")
    except Exception as exc:  # Spark wraps raise_error
        assert "out of packing range" in str(exc)


def test_temperature_mix_flattens_and_keeps_small_source(spark):
    import math

    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [Row(doc_id=i, src="big") for i in range(300)]
    rows += [Row(doc_id=300 + i, src="small") for i in range(50)]
    df = spark.createDataFrame(rows)
    out = temperature_mix(df, "src", "doc_id", alpha=0.5)
    got = {r[0]: r[1] for r in
           out.groupBy("src").count().collect()}
    # replicate the quota math
    w = {s: round(math.pow(n / 350, 0.5), 9)
         for s, n in (("big", 300), ("small", 50))}
    sw = round(math.fsum(w.values()), 9)
    p = {s: round(x / sw, 9) for s, x in w.items()}
    budget = min(300 / p["big"], 50 / p["small"])
    assert got["small"] == int(math.floor(budget * p["small"]))
    assert got["big"] == int(math.floor(budget * p["big"]))
    # flattening: small's output share strictly exceeds its 1/7 natural
    # share; the small source is the budget binder (kept ~whole)
    share = got["small"] / (got["small"] + got["big"])
    assert share > 50 / 350
    assert got["small"] == 50
    # alpha=1 reduces to (near-)natural proportions: everything kept
    nat = temperature_mix(df, "src", "doc_id", alpha=1.0)
    assert nat.count() >= 349  # floor rounding may drop <= 1 row
    # determinism across repartition
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in
               temperature_mix(df.repartition(7), "src", "doc_id",
                               alpha=0.5).collect())
    assert a == b


def test_weighted_topk_sample_matches_reference_and_is_weighted(spark):
    """Exact parity with a hashlib reference, and heavier rows are
    sampled more often across disjoint id universes."""
    import hashlib

    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.sampling import (
        weighted_topk_sample,
    )

    rows = [Row(doc_id=i, wt=(8 if i % 10 == 0 else 1))
            for i in range(500)]
    df = spark.createDataFrame(rows)
    got = [(r.doc_id, r.weight, r.min_ticket, r.sample_rank)
           for r in weighted_topk_sample(df, "doc_id", "wt", k=40)
           .orderBy("sample_rank").collect()]

    def ref_min(i, w):
        return min(int(hashlib.md5(f"{i}#{j}".encode()).hexdigest()[:8],
                       16) for j in range(1, w + 1))

    mins = sorted(((ref_min(i, 8 if i % 10 == 0 else 1), i)
                   for i in range(500)))[:40]
    assert [(i, t) for t, i in mins] == [(g[0], g[2]) for g in got]
    assert [g[3] for g in got] == list(range(1, 41))
    # weighted: the 10% heavy rows take well over 10% of the sample
    heavy = sum(1 for g in got if g[1] == 8)
    assert heavy >= 15

    # determinism under repartition
    again = [(r.doc_id, r.sample_rank) for r in
             weighted_topk_sample(df.repartition(13), "doc_id", "wt",
                                  k=40).collect()]
    assert sorted(again) == sorted((g[0], g[3]) for g in got)

    import pytest
    with pytest.raises(ValueError):
        weighted_topk_sample(df, "doc_id", "wt", k=0)
