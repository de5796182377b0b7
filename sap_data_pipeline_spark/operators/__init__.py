from sap_data_pipeline_spark.operators import (
    corpus,
    dedup,
    merge,
    multimodal,
    relational,
    rollup,
    sampling,
    similarity,
    temporal,
)

__all__ = [
    "corpus", "dedup", "merge", "multimodal", "relational",
    "rollup", "sampling", "similarity", "temporal",
]
