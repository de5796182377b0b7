from sap_data_pipeline_spark.operators import (
    dedup,
    merge,
    multimodal,
    relational,
    similarity,
)

__all__ = ["dedup", "merge", "multimodal", "relational", "similarity"]
