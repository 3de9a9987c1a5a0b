from agile_lakehouse_spark.operators import (
    dedup,
    multimodal,
    pipeline,
    pointcloud,
    relational,
    similarity,
    text,
)

__all__ = ["dedup", "multimodal", "pipeline", "pointcloud", "relational", "similarity", "text"]
