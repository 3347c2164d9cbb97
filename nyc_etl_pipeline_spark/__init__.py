"""nyc_etl_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
NYC-ETL-Pipeline (batch medallion ETL over taxi-trip records; see
SURVEY.md) as an idiomatic Spark engine:

- one long-lived SparkSession (reference: one per Dagster asset)
- explicit StructType schemas (reference: inference by convention)
- pure DataFrame -> DataFrame transforms, no pandas round-trips
- Parquet lakehouse tables with partition-overwrite idempotency
  (reference: append-only JDBC sinks, non-idempotent re-runs)
- LLM-data-pipeline operators (dedup, similarity, text analysis,
  multimodal plumbing) beyond the reference surface.

All query processing is declared via the DataFrame/SQL API so Catalyst
handles pushdown, pruning, join strategy, and AQE at scale.
"""

from nyc_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
