from nyctaxidatapipeline_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    read_parquet,
)

__all__ = ["TABLES", "load_table", "load_tables", "read_parquet"]
