from agile_lakehouse_spark.operators import dedup, pointcloud, relational, similarity, text

__all__ = ["dedup", "pointcloud", "relational", "similarity", "text"]
