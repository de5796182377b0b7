"""sap_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
SAP ETL pipeline (anniechen091/sap-data-pipeline) as an idiomatic Spark
engine: declarative DataFrame plans optimized by Catalyst, Parquet-backed
keyed MERGE upserts, Structured-Streaming ingestion, plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal column plumbing).

Layout:
    session     — SparkSession factory tuned for the target scale
    sources/    — readers (star schema, SAP-export text files, dim
                  workbooks), sinks, batch done-ledger
    functions/  — scalar expression library (cleaning, text, vectors)
    operators/  — composable DataFrame->DataFrame operators (relational,
                  merge/upsert, dedup, similarity, rollup, multimodal)
    plans/      — full analytical query pipelines (weekly_sales, store_rp)
                  and the driver-facing query catalog
    streaming/  — Structured Streaming ingestion (watch-folder semantics),
                  session windows, custom stateful operators
    etl         — end-to-end per-T-code pipeline flows
    utils       — driver-side retry policy
"""

from sap_data_pipeline_spark.operators.merge import ParquetMergeTable
from sap_data_pipeline_spark.session import get_spark
from sap_data_pipeline_spark.sources.ledger import ProcessedLedger
from sap_data_pipeline_spark.sources.readers import (
    load_star,
    read_dim_table,
    read_sap_export,
)

__all__ = [
    "ParquetMergeTable",
    "ProcessedLedger",
    "get_spark",
    "load_star",
    "read_dim_table",
    "read_sap_export",
]
__version__ = "0.1.0"
