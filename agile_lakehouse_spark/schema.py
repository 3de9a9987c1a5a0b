"""Point-cloud schema conventions: ``pc.*`` field metadata.

The reference marks spatial semantics with Arrow field-metadata keys
(``pc-format/src/schema.rs:11-17``): ``PC:dimension`` (integer order of an
indexable dimension), ``PC:location`` (coordinate axis name), ``PC:importance``
(level-of-detail column), ``PC:offset``/``PC:scale`` (LAS grid transform).
Spark StructFields carry the same information in ``StructField.metadata``,
which round-trips through Parquet — so a table written by the layout engine
keeps its dimension annotations for later readers.

Key names are lower-cased (``pc.dimension`` …) per Spark metadata convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import NumericType, StructField, StructType

PC_DIMENSION = "pc.dimension"
PC_LOCATION = "pc.location"
PC_IMPORTANCE = "pc.importance"
PC_OFFSET = "pc.offset"
PC_SCALE = "pc.scale"


def annotate(
    schema: StructType,
    dimensions: dict[str, int] | None = None,
    locations: dict[str, str] | None = None,
    importance: str | None = None,
    transforms: dict[str, tuple[float, float]] | None = None,
) -> StructType:
    """Return a copy of ``schema`` with pc.* metadata attached.

    ``dimensions`` maps column name -> 1-based dimension order (x=1, y=2,
    z=3, i=4 in the reference); ``locations`` maps column -> axis name;
    ``importance`` names the LoD column; ``transforms`` maps column ->
    (offset, scale) for raw integer coordinates.
    """
    dimensions = dimensions or {}
    locations = locations or {}
    transforms = transforms or {}
    fields = []
    for f in schema.fields:
        meta = dict(f.metadata or {})
        if f.name in dimensions:
            meta[PC_DIMENSION] = int(dimensions[f.name])
        if f.name in locations:
            meta[PC_LOCATION] = locations[f.name]
        if importance is not None and f.name == importance:
            meta[PC_IMPORTANCE] = True
        if f.name in transforms:
            meta[PC_OFFSET], meta[PC_SCALE] = map(float, transforms[f.name])
        fields.append(StructField(f.name, f.dataType, f.nullable, meta))
    return StructType(fields)


def with_pc_metadata(df: DataFrame, **kwargs) -> DataFrame:
    """Attach pc.* metadata to a DataFrame (see :func:`annotate`)."""
    return _rebind(df, annotate(df.schema, **kwargs))


def _rebind(df: DataFrame, schema: StructType) -> DataFrame:
    # Cheap metadata rebind: alias each column with its annotated metadata
    # (no shuffle, no RDD round-trip — stays a pure Catalyst projection).
    from pyspark.sql import functions as F

    cols = []
    for f in schema.fields:
        cols.append(F.col(f.name).alias(f.name, metadata=dict(f.metadata or {})))
    return df.select(*cols)


def dimensions(schema: StructType) -> list[str]:
    """Indexable dimension columns sorted by their pc.dimension order.

    Mirrors ``dimensions(schema)`` (``pc-format/src/schema.rs:20-29``).
    """
    dims = [
        (int(f.metadata[PC_DIMENSION]), f.name)
        for f in schema.fields
        if f.metadata and PC_DIMENSION in f.metadata
    ]
    return [name for _, name in sorted(dims)]


def importance(schema: StructType) -> str | None:
    """Name of the importance (LoD) column, if any (schema.rs:32-41)."""
    for f in schema.fields:
        if f.metadata and f.metadata.get(PC_IMPORTANCE):
            return f.name
    return None


def validate(schema: StructType) -> None:
    """Require >= 3 indexable dimensions, all numeric (schema.rs:76-97)."""
    dims = dimensions(schema)
    if len(dims) < 3:
        raise ValueError(f"point-cloud schema needs >= 3 dimensions, got {dims}")
    by_name = {f.name: f for f in schema.fields}
    for d in dims:
        if not isinstance(by_name[d].dataType, NumericType):
            raise TypeError(f"dimension column {d!r} must be numeric, is {by_name[d].dataType}")


def add_importance(df: DataFrame, name: str = "i", seed: int = 42) -> DataFrame:
    """Append a uniform-random importance column in [0,1) (idempotent).

    Mirrors ``add_importance`` + the importance kernel
    (``pc-format/src/schema.rs:44-73``, ``pc-format/src/compute.rs:29-75``).
    The reference uses an unseeded thread RNG (irreproducible); we use
    ``F.rand(seed)`` — deterministic per partition layout — cast to float
    (Spark has no f16; f32 is the stand-in, SURVEY.md §7).
    """
    from pyspark.sql import functions as F

    if name in df.columns:
        return df
    out = df.withColumn(name, F.rand(seed).cast("float"))
    return _rebind(out, annotate(out.schema, dimensions={name: len(df.columns) + 1}, importance=name))
