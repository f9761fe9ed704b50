"""Declarative data-quality validation (the Deequ / dbt-test shape).

A rule set is a mapping ``name -> boolean Column``; validation reports,
per rule, how many rows fail it. The design constraint is the same one
``profile.correlations`` follows: ALL rules evaluate in ONE aggregate
pass over ONE scan — never a job per rule (Deequ's core trick). At
100 TB the cost is the scan plus k CASE/SUM expressions riding the same
whole-stage-codegen'd aggregate; adding a rule is free.

NULL discipline: a rule passes only where the predicate is TRUE —
NULL-valued predicates count as violations (SQL's WHERE would silently
drop them, which is exactly how bad rows hide). Express "nullable ok"
explicitly: ``col.isNull() | (col > 0)``.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate every rule in one aggregate pass.

    Output: (rule, n_violations, n_rows, pass_rate) — one row per rule
    (struct-array unpivot of the single-row aggregate; positional
    aliases, immune to hostile rule names).
    """
    if not rules:
        raise ValueError("validate needs at least one rule")
    names = list(rules)
    agg = df.agg(
        F.count("*").alias("_n"),
        *[F.sum(F.when(rules[r], 0).otherwise(1)).alias(f"_v{i}")
          for i, r in enumerate(names)])
    rows = F.array(*[
        F.struct(
            F.lit(r).alias("rule"),
            F.coalesce(F.col(f"_v{i}"), F.lit(0)).alias("n_violations"),
            F.col("_n").alias("n_rows"),
            F.when(F.col("_n") > 0,
                   F.round(1.0 - F.coalesce(F.col(f"_v{i}"), F.lit(0))
                           / F.col("_n"), 6)).alias("pass_rate"))
        for i, r in enumerate(names)])
    return (agg.select(F.explode(rows).alias("_r"))
               .select("_r.rule", "_r.n_violations", "_r.n_rows",
                       "_r.pass_rate"))


def enforce(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Quarantine split companion to ``validate``: keep only rows
    passing EVERY rule (NULL predicates fail, same discipline). One
    filter, no extra pass — compose ``validate`` for the report and
    ``enforce`` for the clean stream off the same cached input."""
    if not rules:
        raise ValueError("enforce needs at least one rule")
    cond = None
    for c in rules.values():
        cond = c if cond is None else cond & c
    return df.filter(F.coalesce(cond, F.lit(False)))
