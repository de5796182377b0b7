"""sap_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
SAP ETL pipeline (anniechen091/sap-data-pipeline) as an idiomatic Spark
engine: declarative DataFrame plans optimized by Catalyst, Parquet-backed
keyed MERGE upserts, Structured-Streaming ingestion, plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal column plumbing).

Layout:
    session     — SparkSession factory tuned for the target scale
    sources/    — readers (star schema, SAP-export text files) and sinks
    functions/  — scalar expression library (cleaning, text, vectors)
    operators/  — composable DataFrame->DataFrame operators (relational,
                  merge/upsert, dedup, similarity, multimodal)
    plans/      — full analytical query pipelines (weekly_sales, store_rp)
    streaming/  — Structured Streaming ingestion (watch-folder semantics)
"""

from sap_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
