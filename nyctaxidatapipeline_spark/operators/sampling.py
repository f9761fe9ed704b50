"""Deterministic sampling & dataset splitting for training pipelines.

Train/val/test assignment must be a pure function of the row key — not of
partitioning, row order, or an RNG stream — so that (a) every rerun and
every engine assigns a row to the same split, (b) adding data never
reshuffles old rows across splits, (c) no coordination or persisted split
table is needed at 100 TB. The standard trick: hash the key, bucket the
hash. ``rand(seed)`` fails all three (seed is per-partition, so any
repartition reshuffles assignments).

We use the first 8 hex chars of md5(key) — md5 exists bit-identically in
Spark, DuckDB, Python hashlib, and virtually everything else, so the
split is reproducible across the whole toolchain (xxhash64 is
Spark-specific and was rejected for that reason). 32 bits ≫ enough for
percentage-granularity buckets.

Everything is a narrow projection + filter: no shuffle, fully
pushdown-friendly, and at 100 TB each split can be written with
``partitionBy`` in the same pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key's
    string form. DuckDB oracle twin:
    ``('0x' || substr(md5(key::VARCHAR), 1, 8))::BIGINT % n``."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return (h.cast("bigint") % n_buckets).cast("int")


def with_split(df: DataFrame, key_col: str,
               splits: Sequence[tuple[str, int]] = (
                   ("train", 80), ("val", 10), ("test", 10)),
               bucket_col: str = "_bucket") -> DataFrame:
    """Add a ``split`` label column by hash-bucketing ``key_col``.

    ``splits`` are (name, percent) with percents summing to ≤ 100 (any
    remainder is labeled NULL — i.e. held out). Assignment is by
    contiguous bucket ranges, so split sizes are exact in expectation and
    every row's label is stable under reruns, repartitions, and appends.
    """
    total = sum(p for _, p in splits)
    if total > 100:
        raise ValueError(f"splits sum to {total} > 100")
    b = hash_bucket(F.col(key_col))
    expr, lo = None, 0
    for name, pct in splits:
        cond = b < F.lit(lo + pct) if lo == 0 else (
            (b >= F.lit(lo)) & (b < F.lit(lo + pct)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn(bucket_col, b).withColumn("split", expr)


def deterministic_sample(df: DataFrame, key_col: str,
                         fraction: float) -> DataFrame:
    """Keep a stable ~``fraction`` of rows by hash threshold — the
    coordination-free way to downsample a 100 TB corpus reproducibly
    (same rows survive on any cluster, any run)."""
    n = 1_000_000
    return df.filter(hash_bucket(F.col(key_col), n)
                     < F.lit(int(fraction * n)))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic hash sampling — rebalance a skewed
    corpus (the classic move: downsample the over-represented language,
    keep all of the low-resource ones).

    Each row survives iff ``hash_bucket(key) < fraction(its stratum)`` —
    a pure function of (key, stratum), so the sample is stable under
    reruns, repartitions, and appends, strata stay mutually consistent
    (a row's survival never depends on other rows), and the plan is a
    narrow filter: no shuffle, no per-stratum pass, pushdown-friendly.
    Strata missing from ``fractions`` get ``default_fraction`` (0.0 =
    drop; 1.0 = keep all).
    """
    n = 1_000_000
    b = hash_bucket(F.col(key_col), n)
    thr = None
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} is {frac}, "
                             "must be in [0, 1]")
        cond = F.col(strata_col) == name
        lim = F.lit(int(frac * n))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    default_lim = F.lit(int(default_fraction * n))
    thr = default_lim if thr is None else thr.otherwise(default_lim)
    return df.filter(b < thr)


def mix_sources(df: DataFrame, source_col: str, id_col: str,
                proportions: dict[str, float]) -> DataFrame:
    """Deterministic dataset mixing: draw from each source so the output
    matches the target ``proportions`` exactly, without replacement —
    the training-data mixing step (e.g. 50% web / 30% wiki / 20% books)
    that every LLM data recipe runs before tokenization.

    Budget: the largest total ``T`` every source can serve is
    ``min_i(n_i / p_i)``; each source then contributes its
    ``floor(T * p_i)`` rows with the smallest ``(md5(id), id)`` — the
    same portable hash-order draw as ``seed_centroids``/``with_split``,
    so reruns, engines, and append-only growth of OTHER sources never
    change a source's picks (its own growth only ADDS picks when the
    budget rises).

    Plan: one count aggregate over the source column (tiny, broadcast),
    one rank window per source partition, one filter. Proportions must
    sum to ~1 and every source must exist. Output: input columns,
    unsampled sources dropped.
    """
    total_p = sum(proportions.values())
    if abs(total_p - 1.0) > 1e-9:
        raise ValueError(f"proportions sum to {total_p}, expected 1.0")
    if any(p <= 0 for p in proportions.values()):
        raise ValueError("every proportion must be > 0 (drop a source "
                         "from the dict instead of setting it to 0)")
    from fractions import Fraction

    from pyspark.sql import Window

    items = list(proportions.items())
    counts = {r[source_col]: r["n"]
              for r in (df.filter(F.col(source_col)
                                  .isin([s for s, _ in items]))
                          .groupBy(source_col)
                          .agg(F.count("*").alias("n"))).collect()}
    missing = [s for s, _ in items if s not in counts]
    if missing:
        raise ValueError(f"sources absent from the data: {missing}")
    # Quota math in exact rationals: the DuckDB oracle twin evaluates
    # n/p and floor(T*p) in DECIMAL, so IEEE-double rounding here could
    # disagree by one row on exact quota boundaries (3/0.3 is
    # 10.000000000000002 as doubles but exactly 10 in decimal).
    # Fraction(str(p)) parses the decimal literal exactly, matching the
    # oracle's semantics on every input.
    budget = min(Fraction(counts[s]) / Fraction(str(p)) for s, p in items)
    quota = F.create_map(*[x for s, p in items
                           for x in (F.lit(s),
                                     F.lit(int(budget * Fraction(str(p)))))])
    w = (Window.partitionBy(source_col)
         .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)))
    return (df.filter(F.col(source_col).isin([s for s, _ in items]))
              .withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= quota[F.col(source_col)])
              .drop("_rk"))


def temperature_mix(df: DataFrame, source_col: str, id_col: str,
                    alpha: float = 0.5) -> DataFrame:
    """Temperature-flattened source mixing — the multilingual /
    multi-source LLM sampling recipe (XLM-R, mT5): target proportions
    ``p_i ∝ (n_i/N)^alpha`` upweight low-resource sources as ``alpha``
    drops below 1 (alpha=1 = natural proportions, alpha→0 = uniform),
    then the same deterministic without-replacement quota draw as
    ``mix_sources`` fills them.

    Determinism: the exponentiated weights, their sum, and the final
    proportions are each rounded to 9 dp before use — and the
    REGISTERED operating point is alpha=0.5, where ``pow(x, 0.5)`` is
    IEEE-exactly-rounded sqrt on both engines, so the oracle reproduces
    the proportions bit-for-bit (arbitrary alpha carries the usual
    measure-zero libm-pow boundary caveat). Weight summation runs in
    sorted-source order on the driver; the oracle's unordered SUM can
    differ by 1 ulp pre-rounding — snapped by the 9 dp round like every
    other cross-engine float path in this repo.

    Plan: one tiny count aggregate (collected — |sources| rows), one
    rank window per source partition, one filter. Same shape as
    ``mix_sources``; scales identically.
    """
    import math

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from pyspark.sql import Window

    counts = {r[source_col]: r["n"]
              for r in (df.groupBy(source_col)
                          .agg(F.count("*").alias("n"))).collect()}
    if not counts:
        return df
    total = sum(counts.values())
    srcs = sorted(counts)
    w = {s: round(math.pow(counts[s] / total, alpha), 9) for s in srcs}
    sw = round(math.fsum(w[s] for s in srcs), 9)
    p = {s: round(w[s] / sw, 9) for s in srcs}
    budget = min(counts[s] / p[s] for s in srcs)
    quota = F.create_map(*[x for s in srcs
                           for x in (F.lit(s),
                                     F.lit(int(math.floor(budget
                                                          * p[s]))))])
    win = (Window.partitionBy(source_col)
           .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)))
    return (df.withColumn("_rk", F.row_number().over(win))
              .filter(F.col("_rk") <= quota[F.col(source_col)])
              .drop("_rk"))


def cap_per_group(df: DataFrame, group_cols: Sequence[str], id_col: str,
                  max_rows: int) -> DataFrame:
    """Deterministically cap each group at ``max_rows`` rows — the
    anti-domination curation rule (C4 caps pages per URL/domain so one
    crawler-friendly site cannot swamp the corpus; the same cap guards
    label balance and per-user contribution limits).

    Kept rows are the group's smallest ``(md5(id), id)`` — the portable
    hash-order draw, so the survivors are engine-reproducible and
    stable under reruns and append growth of OTHER groups (a group's
    own growth can only swap-in lower-hash rows, the documented
    trade of budget-free capping). One WindowGroupLimit shuffle on the
    group key — bounded per-group state, no full partition sort.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(*group_cols)
         .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)))
    return (df.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= max_rows)
              .drop("_rk"))


def weighted_sample(df: DataFrame, key_col: str, weight_col: str,
                    scale: float = 1.0) -> DataFrame:
    """Deterministic importance resampling — the step that turns
    per-document importance weights (DSIR ratios, quality scores,
    domain re-weights) into an actual resampled corpus: each row
    survives iff its md5-uniform < min(1, scale * weight), i.e.
    P(keep) proportional to weight with certainty-clamping above
    1/scale (the standard rejection-sampling admit rule; DoReMi/DSIR
    resample exactly this way).

    Pure function of (key, weight): stable under reruns, repartitions
    and appends, and rows never interact — a narrow pushdown-friendly
    filter with no shuffle, like ``deterministic_sample``. Negative
    weights drop with certainty.
    """
    n = 1_000_000
    p = F.least(F.greatest(F.col(weight_col) * F.lit(float(scale)),
                           F.lit(0.0)), F.lit(1.0))
    return df.filter(hash_bucket(F.col(key_col), n) < F.floor(p * n))


def weighted_topk_sample(df: DataFrame, id_col: str, weight_col: str,
                         k: int, max_weight: int = 64) -> DataFrame:
    """Fixed-size weighted sample WITHOUT replacement — the
    Efraimidis-Spirakis top-k, made cross-engine-exact: ES ranks rows
    by ``u^(1/w)``, but pow/ln last-ulp drift between engines could
    flip a knife-edge SELECTION (worse than a value flip — whole rows
    change, the embedding_covariance lesson at membership level).
    For INTEGER weights the same distribution falls out of integer
    arithmetic alone: give row i ``w_i`` tickets with independent
    uniform hashes and rank by its MINIMUM ticket — the min of w
    uniforms orders identically to ``u^(1/w)`` in distribution, and
    the portable 32-bit md5 ticket hashes compare as exact integers.
    Ties (a 1-in-2^32 hash collision) break by id.

    Scale shape: one explode bounded by ``max_weight`` tickets/row
    (weights clamp into [1, max_weight]), a map-side-combined min per
    row, and a global top-k that Spark plans as TakeOrderedAndProject
    (per-partition partial top-k, k-row driver merge) — no full sort.

    Output: (id, weight used, min_ticket, sample_rank), rank 1..k.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_weight < 1 or max_weight > 1024:
        raise ValueError("max_weight must be in [1, 1024]")
    w = F.least(F.greatest(F.col(weight_col).cast("long"), F.lit(1)),
                F.lit(max_weight))
    ticket = F.conv(F.substring(F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit("#"),
                 F.col("_j").cast("string"))), 1, 8), 16, 10) \
        .cast("long")
    mins = (df.select(F.col(id_col), w.alias("_w"))
              .select(id_col, "_w",
                      F.explode(F.expr("sequence(1, _w)")).alias("_j"))
              .select(id_col, "_w", ticket.alias("_t"))
              .groupBy(id_col, "_w")
              .agg(F.min("_t").alias("min_ticket")))
    ranked = (mins.orderBy("min_ticket", id_col).limit(k)
                  .select(F.col(id_col), F.col("_w").alias("weight"),
                          "min_ticket"))
    rw = Window.orderBy("min_ticket", id_col)
    return ranked.withColumn("sample_rank",
                             F.row_number().over(rw).cast("int"))


def negative_samples(df: DataFrame, id_col: str, k: int = 4,
                     anchor_col: str = "anchor_id",
                     neg_col: str = "negative_id") -> DataFrame:
    """k deterministic pseudo-random negatives per row (with
    replacement, never the anchor itself) — the negative-sampling step
    of contrastive / triplet training data, as a pure function of the
    ids so every engine, rerun and repartition draws the same pairs.

    Construction: a dense rank 1..n over ``id_col`` (distributed
    two-pass prefix sum — no single-task window), then for draw j the
    partner rank is ``1 + md5(id:j) % (n-1)``, shifted past the
    anchor's own rank (the classic skip-self trick, uniform over the
    other n-1 rows), resolved back to an id by an equi-join on rank.
    Shuffles: the prefix sum's bucketed exchanges + one rank join;
    the n scalar rides as a 1-row broadcast. Requires ≥ 2 rows and a
    unique integral non-negative ``id_col``.

    The ranked table feeds BOTH sides (anchor expansion and the
    rank→id lookup), so it is ``localCheckpoint``-ed: without it the
    whole prefix-sum subtree — its shuffles and its 1-row bounds
    broadcast — plans and executes twice.

    Output: (anchor_id, j, negative_id), k rows per anchor.
    """
    from nyctaxidatapipeline_spark.operators.packing import (
        distributed_prefix_sum,
    )

    base = (df.select(F.col(id_col).cast("bigint").alias("_id"))
              .withColumn("_ord", F.col("_id")))
    ranked = (distributed_prefix_sum(base, F.lit(1), "_ord", alias="_rn")
              .drop("_ord")
              .localCheckpoint(eager=False))
    n = ranked.agg(F.count(F.lit(1)).alias("_n"))
    e = (ranked.crossJoin(F.broadcast(n))
         .select("_id", "_rn", "_n",
                 F.explode(F.sequence(F.lit(0),
                                      F.lit(k - 1))).alias("j")))
    h = F.conv(F.substring(
        F.md5(F.concat(F.col("_id").cast("string"), F.lit(":"),
                       F.col("j").cast("string"))), 1, 8), 16, 10)
    draw = F.lit(1) + h.cast("bigint") % (F.col("_n") - 1)
    neg_rn = F.when(draw >= F.col("_rn"), draw + 1).otherwise(draw)
    pairs = e.select(F.col("_id").alias(anchor_col), "j",
                     neg_rn.alias("_neg_rn"))
    lookup = ranked.select(F.col("_rn").alias("_neg_rn"),
                           F.col("_id").alias(neg_col))
    return pairs.join(lookup, "_neg_rn").drop("_neg_rn")


def curriculum_order(df: DataFrame, level_col: str, id_col: str,
                     pos_col: str = "pos") -> DataFrame:
    """Deterministic curriculum ordering: a global 1-based position
    that sorts rows by difficulty ``level_col`` (ascending int levels
    — e.g. perplexity tertile 0/1/2) while SHUFFLING uniformly within
    each level by an md5 draw on the id — the standard
    curriculum-learning layout (easy levels first, no intra-level
    order bias), as a pure function of (level, id): stable across
    reruns, repartitions and engines.

    Scale shape: the global position comes from the distributed
    two-pass prefix sum over the combined numeric key
    ``level·2^50 + md5_48(id)`` (48-bit draws collide eventually, so
    ``id_col`` rides as the window tiebreak — bucket assignment only
    reads the key, and a tie group can't straddle a bucket boundary).
    NO single-task global window, no ntile. One bounds aggregate + the
    bucketed exchanges.

    Output: input columns + (pos_col). ``level_col`` must be a small
    non-negative int (< 8192) for the key packing to stay in 63 bits.
    """
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12),
               16, 10).cast("bigint")
    # Runtime guard for the docstring's 63-bit packing contract: a
    # level >= 8192 or < 0 would silently overflow signed 64-bit and
    # produce a WRONG ordering; fail the job instead. Row-local check,
    # no extra pass.
    lvl = F.col(level_col).cast("bigint")
    guarded = F.when((lvl >= 0) & (lvl < 8192), lvl).otherwise(
        F.raise_error(F.concat(
            F.lit(f"curriculum_order: {level_col} out of packing "
                  "range [0, 8192): "), lvl.cast("string"))))
    keyed = df.withColumn("_ck", guarded * F.lit(1 << 50) + h)
    from nyctaxidatapipeline_spark.operators.packing import (
        distributed_prefix_sum,
    )

    return (distributed_prefix_sum(keyed, F.lit(1), "_ck",
                                   alias=pos_col,
                                   tiebreak_cols=(id_col,))
            .drop("_ck"))
