"""agile_lakehouse_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
AGILE-2025 point-cloud lakehouse reference (tum-bgd/2025-AGILE-Lakehouse),
re-expressed Spark-first: DataFrame/SQL logical plans, Catalyst/Tungsten
physical execution, Parquet columnar storage, Structured Streaming for
streams.  Custom code is confined to (a) layout jobs, (b) ingest adapters,
(c) thin semantic wrappers; everything else is a Catalyst built-in.

Layout:
    session      SparkSession factory (mirrors pc-io/src/config.rs intent)
    schema       pc.* field-metadata conventions (pc-format/src/schema.rs)
    sources/     catalog + ingest adapters (LAS/PLY gated, Parquet native)
    functions/   portable scalar/vector expression builders
    operators/   query operators (point cloud, relational, dedup, text, ANN)
    plans/       data-layout engine (grid / importance quadtree) + explain
    streaming/   Structured Streaming windows/watermark/stateful ops
"""

from agile_lakehouse_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
