from agile_lakehouse_spark.functions import portable, vector

__all__ = ["portable", "vector"]
