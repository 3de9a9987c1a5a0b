from agile_lakehouse_spark.streaming import windows

__all__ = ["windows"]
