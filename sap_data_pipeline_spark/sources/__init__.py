from sap_data_pipeline_spark.sources import warc
from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable
from sap_data_pipeline_spark.sources.readers import (
    Star,
    load_star,
    read_jsonl_corpus,
    read_sap_export,
)
from sap_data_pipeline_spark.sources.sinks import write_parquet_atomic

__all__ = [
    "Star", "VersionedParquetTable", "load_star", "read_jsonl_corpus",
    "read_sap_export", "warc", "write_parquet_atomic",
]
