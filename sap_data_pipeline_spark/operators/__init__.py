from sap_data_pipeline_spark.operators import (
    corpus,
    dedup,
    graph,
    merge,
    multimodal,
    relational,
    rollup,
    sampling,
    similarity,
    temporal,
)

__all__ = [
    "corpus", "dedup", "graph", "merge", "multimodal", "relational",
    "rollup", "sampling", "similarity", "temporal",
]
