"""nyctaxidatapipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference pipeline ``colinthekkinedath/nyctaxidatapipeline``
(surveyed in SURVEY.md), extended with the operators a large-scale
training-data pipeline needs: joins/windows/set-ops, deduplication,
embedding-similarity search, text analysis, multimodal column plumbing and
Structured Streaming.

Design rules (see SURVEY.md §7):
  * DataFrame / Spark-SQL only on the hot path — no RDDs, no row-at-a-time
    Python UDFs; Pandas UDFs (Arrow) only where built-ins can't express the
    semantics (minhash/simhash sketches, multimodal decode).
  * Every operator takes and returns DataFrames so it composes and can be
    differentially tested against a DuckDB oracle.
  * Declarative plans so Catalyst does pushdown / pruning / partial-agg /
    broadcast selection; physical hints (broadcast, repartition) only where
    the 100 TB plan needs them.
"""

from nyctaxidatapipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.2.3"
