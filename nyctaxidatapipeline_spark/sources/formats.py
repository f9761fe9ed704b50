"""File-format sources beyond parquet: CSV, JSON, ORC, and JDBC read.

The reference reads parquet only (S1/S2); a complete engine needs the rest
of the lake-format surface. All built-in Spark readers with explicit
schemas (inference costs an extra full scan and drifts types — never in
production paths; ``infer_schema=True`` exists for exploration).

Scale notes: CSV/JSON are row-formats — no column pruning or predicate
pushdown; land them once and convert to parquet (``convert_to_parquet``)
before analytics. ORC gets the same pushdown treatment as parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from nyctaxidatapipeline_spark import sinks


def read_csv(spark: SparkSession, path: str,
             schema: T.StructType | str | None = None,
             header: bool = True, infer_schema: bool = False,
             **options) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str,
              schema: T.StructType | str | None = None,
              multiline: bool = False, **options) -> DataFrame:
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_jdbc(spark: SparkSession, cfg: "sinks.JdbcConfig", table: str,
              partition_column: str | None = None,
              num_partitions: int = 8,
              lower_bound: int | None = None,
              upper_bound: int | None = None) -> DataFrame:
    """JDBC source (untestable offline — SURVEY.md §5 caveat 5; the option
    plumbing mirrors the write path). Partitioned reads split the table
    into ``num_partitions`` range slices so executors pull in parallel —
    without them a JDBC read is a single-task bottleneck.
    """
    reader = (spark.read.format("jdbc")
              .option("url", cfg.url)
              .option("dbtable", table)
              .option("user", cfg.user)
              .option("password", cfg.password)
              .option("driver", cfg.driver))
    if partition_column is not None:
        reader = (reader
                  .option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    return reader.load()


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_xml(spark: SparkSession, path: str, row_tag: str = "row",
             schema: T.StructType | str | None = None,
             **options) -> DataFrame:
    """Spark 4's native XML source (no external spark-xml jar needed).
    ``row_tag`` names the repeated element that maps to one row; like
    CSV/JSON, prefer an explicit schema over inference at scale, and
    land as parquet (``convert_to_parquet``) before real query work —
    XML is a row-at-a-time text format with no pushdown or pruning."""
    reader = spark.read.option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format("xml").load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row",
              root_tag: str = "rows", mode: str = "overwrite") -> None:
    (df.write.mode(mode)
       .option("rowTag", row_tag).option("rootTag", root_tag)
       .format("xml").save(path))


def convert_to_parquet(spark: SparkSession, src: DataFrame, out_path: str,
                       partition_by: list[str] | None = None) -> DataFrame:
    """Land a row-format source as (optionally partitioned) parquet and
    return the re-opened columnar frame — the once-per-dataset step that
    buys pushdown/pruning for every later query."""
    sinks.write_parquet(src, out_path, partition_by=partition_by)
    return spark.read.parquet(out_path)
