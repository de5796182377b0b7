from sap_data_pipeline_spark.sources.readers import Star, load_star, read_sap_export
from sap_data_pipeline_spark.sources.sinks import write_parquet_atomic

__all__ = ["Star", "load_star", "read_sap_export", "write_parquet_atomic"]
