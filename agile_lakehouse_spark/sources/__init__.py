from agile_lakehouse_spark.sources.catalog import TABLES, load_table, points_view, register_all

__all__ = ["TABLES", "load_table", "points_view", "register_all"]
