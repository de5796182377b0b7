from sap_data_pipeline_spark.streaming.ingest import (
    stream_file_source,
    stream_merge_sink,
    windowed_event_agg,
)

__all__ = ["stream_file_source", "stream_merge_sink", "windowed_event_agg"]
