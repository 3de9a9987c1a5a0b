from agile_lakehouse_spark.plans import explain, layout

__all__ = ["explain", "layout"]
