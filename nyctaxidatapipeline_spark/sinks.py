"""Sinks: the reference's output layer (S3 parquet, S4 JDBC, S5 console),
behind one abstraction so the JDBC path stays available but optional
(SURVEY.md §5 caveat 5 — MySQL is untestable offline).

Reference: ``yellow_taxi_etl.py:37-48`` (_write_mysql helper),
``cleaning.py:20`` (parquet overwrite), ``cleaning.py:23`` (show).
Write-mode semantics preserved: callers pick overwrite/append per table;
the reference hard-codes ``fare_anomalies`` to overwrite even under
``--append`` (``yellow_taxi_etl.py:207``).

Scale notes:
  * Parquet: ``partition_by`` date/zone columns gives hive-style partition
    pruning downstream — the single biggest storage-layout win at 100 TB
    (the reference writes unpartitioned; SURVEY.md §4 flags this).
  * JDBC: each output partition opens its own connection — coalesce small
    aggregate outputs first so a 1000-executor job doesn't open 32k
    connections against one MySQL.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class JdbcConfig:
    """Connection details for S4 (reference ``yellow_taxi_etl.py:11-14``)."""
    url: str
    user: str
    password: str
    driver: str = "com.mysql.cj.jdbc.Driver"
    extra_options: dict[str, str] = field(default_factory=dict)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: Sequence[str] | None = None,
                  compression: str = "snappy") -> None:
    """S3 — parquet sink (reference ``cleaning.py:20``), plus the
    ``partitionBy`` layout improvement of SURVEY.md §4."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc(df: DataFrame, table: str, cfg: JdbcConfig,
               mode: str = "overwrite",
               coalesce_to: int | None = 8) -> None:
    """S4 — JDBC sink (reference ``yellow_taxi_etl.py:37-48``).

    ``coalesce_to`` caps the number of simultaneous DB connections
    (executors open one per partition); aggregate outputs here are small,
    so 8 writers saturate a single MySQL without melting it.
    """
    if coalesce_to is not None and coalesce_to > 0:
        df = df.coalesce(coalesce_to)
    writer = (df.write.format("jdbc")
                .option("url", cfg.url)
                .option("dbtable", table)
                .option("user", cfg.user)
                .option("password", cfg.password)
                .option("driver", cfg.driver))
    for k, v in cfg.extra_options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def write_console(df: DataFrame, n: int = 20, truncate: bool = True) -> None:
    """S5 — preview sink (reference ``cleaning.py:23``)."""
    df.show(n, truncate=truncate)


def write_output(df: DataFrame, sink: str = "parquet", **kwargs) -> None:
    """Dispatch: ``sink`` in {parquet, jdbc, console, noop}. ``noop`` forces
    full materialization without I/O (benchmarking)."""
    if sink == "parquet":
        write_parquet(df, **kwargs)
    elif sink == "jdbc":
        write_jdbc(df, **kwargs)
    elif sink == "console":
        write_console(df, **kwargs)
    elif sink == "noop":
        df.write.format("noop").mode("overwrite").save()
    else:
        raise ValueError(f"unknown sink {sink!r}")
