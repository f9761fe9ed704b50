"""JDBC sink e2e against embedded Apache Derby (ships in Spark's jars for
the Hive metastore, so the test runs fully offline).

This executes the REAL ``.format("jdbc").save()`` path the reference uses
for MySQL (``yellow_taxi_etl.py:37-48``) — only the driver/URL differ,
which is exactly the part ``JdbcConfig`` abstracts. Covers the
reference's write-mode matrix (``yellow_taxi_etl.py:205-211``): default
overwrite, ``--append`` accumulation, and fare_anomalies staying
overwrite even under append.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from nyctaxidatapipeline_spark.sinks import JdbcConfig, write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_cfg(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "sinkdb"
    return JdbcConfig(url=f"jdbc:derby:{db};create=true", user="app",
                      password="app", driver=DERBY_DRIVER)


def _read(spark, cfg, table):
    return (spark.read.format("jdbc")
            .option("url", cfg.url)
            .option("dbtable", table)
            .option("driver", cfg.driver)
            .load())


def _demo(spark, tag):
    return spark.createDataFrame(
        [Row(zone=i, n_trips=10 * i, tag=tag) for i in range(1, 4)])


def test_jdbc_round_trip_overwrite(spark, derby_cfg):
    write_jdbc(_demo(spark, "a"), "heatmap", derby_cfg, mode="overwrite")
    got = {(r.zone, r.n_trips) for r in
           _read(spark, derby_cfg, "heatmap").collect()}
    assert got == {(1, 10), (2, 20), (3, 30)}
    # overwrite replaces, never accumulates
    write_jdbc(_demo(spark, "b"), "heatmap", derby_cfg, mode="overwrite")
    assert _read(spark, derby_cfg, "heatmap").count() == 3


def test_jdbc_append_accumulates(spark, derby_cfg):
    # Map the string column to VARCHAR via createTableColumnTypes —
    # Derby's default CLOB mapping rejects pushed-down string predicates,
    # the same reason a production MySQL sink pins column DDL.
    import dataclasses

    cfg = dataclasses.replace(
        derby_cfg,
        extra_options={"createTableColumnTypes": "tag VARCHAR(16)"})
    write_jdbc(_demo(spark, "a"), "trends", cfg, mode="overwrite")
    write_jdbc(_demo(spark, "b"), "trends", cfg, mode="append")
    out = _read(spark, derby_cfg, "trends")
    assert out.count() == 6
    assert out.filter("tag = 'b'").count() == 3  # predicate pushed to Derby


def test_jdbc_mode_matrix_anomalies_always_overwrite(spark, derby_cfg):
    # Reference semantics (yellow_taxi_etl.py:205-211): under --append,
    # analytics tables append but fare_anomalies is still overwritten.
    # Exercise the same per-table mode selection run_pipeline applies.
    for run in ("r1", "r2"):
        for name in ("analytics_tbl", "fare_anomalies"):
            mode = "overwrite" if name == "fare_anomalies" else "append"
            if run == "r1" and name == "analytics_tbl":
                mode = "overwrite"  # first run bootstraps the table
            write_jdbc(_demo(spark, run), name, derby_cfg, mode=mode)
    assert _read(spark, derby_cfg, "analytics_tbl").count() == 6
    anomalies = _read(spark, derby_cfg, "fare_anomalies")
    assert anomalies.count() == 3
    assert {r.tag for r in anomalies.collect()} == {"r2"}


def test_jdbc_coalesce_cap_applies(spark, derby_cfg):
    # The connection cap must not change the rows written.
    df = spark.range(100).selectExpr("id", "id * 2 AS v").repartition(16)
    write_jdbc(df, "capped", derby_cfg, mode="overwrite", coalesce_to=2)
    assert _read(spark, derby_cfg, "capped").count() == 100
