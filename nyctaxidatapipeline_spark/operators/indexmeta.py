"""Build-parameter stamps for persistable LSH/ANN indexes.

An index frame (``build_minhash_index``, ``build_rp_lsh_index``) is a
pure function of (corpus, build parameters) — but the frame itself
carries no record of those parameters, so a deployment that persists an
index and later probes it with MISMATCHED parameters gets silently
wrong pairs with no runtime signal (ADVICE r10: the query registry
protects itself via parameter-keyed cache paths, but external callers
only had a docstring contract).

The stamp rides the ``band`` column's METADATA (``Column.alias(...,
metadata=...)``): Spark persists column metadata in the parquet footer
(the ``org.apache.spark.sql.parquet.row.metadata`` schema property) and
restores it on read, so the stamp survives the exact persist/read-back
path the ``corpus_index=`` contract describes — at zero row-data cost
and zero runtime cost to validate (schema inspection, no job).

Unstamped indexes (hand-built frames, pre-0.2.1 persists) validate as
before — against the docstring contract only; validation raises ONLY on
a present-and-mismatched stamp.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

#: metadata key under which the JSON parameter dict is stored
INDEX_PARAMS_KEY = "index_params"


def stamp_index_params(df: DataFrame, params: dict,
                       col: str = "band") -> DataFrame:
    """Attach ``params`` (JSON-encoded, values stringified for
    cross-version stability) to ``col``'s column metadata."""
    tag = json.dumps({k: str(v) for k, v in params.items()},
                     sort_keys=True)
    return df.withColumn(
        col, F.col(col).alias(col, metadata={INDEX_PARAMS_KEY: tag}))


def read_index_params(df: DataFrame, col: str = "band") -> dict | None:
    """The stamped parameter dict, or None when ``col`` is absent or
    unstamped."""
    for field in df.schema.fields:
        if field.name == col:
            tag = (field.metadata or {}).get(INDEX_PARAMS_KEY)
            return None if tag is None else json.loads(tag)
    return None


#: ``what`` labels already warned about an unstamped frame this
#: process — warn once per call-site label, not per batch
_WARNED_UNSTAMPED: set[str] = set()


def check_index_params(df: DataFrame, expected: dict, what: str,
                       col: str = "band",
                       expect_stamp: bool = False) -> None:
    """Raise ``ValueError`` when ``df`` carries a stamp whose values
    disagree with ``expected`` on any key BOTH sides know (the probe
    side may not know build-only values like the corpus count — those
    compare only when the caller supplies them). Unstamped frames pass
    (back-compat; the docstring parameter contract still applies) —
    but when the CALLER knows the framework itself built the index
    (``expect_stamp=True``: the streaming doors' read-back paths,
    where the stamp can be dropped in transit by e.g. an anti-join
    that rebuilds the schema), a missing stamp means validation has
    silently degraded to a no-op, so warn once per ``what`` to make
    that observable (ADVICE r11)."""
    got = read_index_params(df, col)
    if got is None:
        if expect_stamp and what not in _WARNED_UNSTAMPED:
            _WARNED_UNSTAMPED.add(what)
            import warnings
            warnings.warn(
                f"{what}: corpus_index arrived UNSTAMPED on a path "
                "where the framework built the index — parameter "
                "validation is degraded to the docstring contract "
                "only (stamp lost in transit, or a pre-0.2.1 "
                "persist)", stacklevel=2)
        return
    exp = {k: str(v) for k, v in expected.items() if v is not None}
    bad = {k: (got[k], exp[k])
           for k in exp.keys() & got.keys() if got[k] != exp[k]}
    if bad:
        detail = ", ".join(f"{k}: index={g!r} vs call={e!r}"
                           for k, (g, e) in sorted(bad.items()))
        raise ValueError(
            f"{what}: corpus_index was built with different parameters "
            f"({detail}) — probing an index at mismatched parameters "
            "produces silently wrong pairs; rebuild the index or match "
            "the call's parameters to it")
