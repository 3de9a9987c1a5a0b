"""PLY reader/writer (reference S7/S8: ``pc-io/src/ply.rs``).

ASCII PLY is implemented dependency-free and round-trip tested: header
parse -> schema, payload -> DataFrame (reader is driver-side — PLY files
are small scene assets, not lake data); writer streams partitions to text
via native expressions + ``concat_ws``.  Binary PLY is gated behind
``plyfile`` (not in this container).

Like LAS, PLY is an ingest/export boundary: convert once, query Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover
    import plyfile  # type: ignore

    HAS_PLYFILE = True
except ImportError:
    plyfile = None
    HAS_PLYFILE = False

_PLY_TO_SPARK = {
    "float": "float",
    "float32": "float",
    "double": "double",
    "float64": "double",
    "int": "int",
    "int32": "int",
    "uint": "bigint",
    "uint32": "bigint",
    "short": "smallint",
    "int16": "smallint",
    "ushort": "int",
    "uint16": "int",
    "char": "tinyint",
    "int8": "tinyint",
    "uchar": "smallint",
    "uint8": "smallint",
}
# PLY has no 64-bit integer type; bigint maps to 'int' (values must fit in
# i32 — better a loud overflow than double's silent precision loss > 2^53).
_SPARK_TO_PLY = {"float": "float", "double": "double", "int": "int", "bigint": "int", "smallint": "short", "tinyint": "char"}


def parse_header(lines: list[str]) -> tuple[list[tuple[str, str]], int, str]:
    """Parse an ascii PLY header -> ([(name, spark_type)], n_rows, format)."""
    if not lines or lines[0].strip() != "ply":
        raise ValueError("not a PLY file")
    props: list[tuple[str, str]] = []
    n_rows, fmt = 0, "ascii"
    in_vertex = False
    for line in lines[1:]:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            in_vertex = parts[1] == "vertex"
            if in_vertex:
                n_rows = int(parts[2])
        elif parts[0] == "property" and in_vertex:
            if parts[1] == "list":
                raise ValueError("list properties unsupported")
            props.append((parts[2], _PLY_TO_SPARK[parts[1]]))
        elif parts[0] == "end_header":
            break
    return props, n_rows, fmt


def read_ply(spark: SparkSession, path: str) -> DataFrame:
    """Read an ascii PLY file into a DataFrame (driver-side parse).

    Binary PLY requires ``plyfile`` (gated).  The reference slices payloads
    at 524,288 rows (``ply.rs:44-220``); here the DataFrame partitioning
    takes that role.
    """
    with open(path, "rb") as f:
        head = f.read(65536)
    header_text = head.split(b"end_header")[0].decode("ascii", "replace")
    props, n_rows, fmt = parse_header(header_text.splitlines() + ["end_header"])
    if fmt != "ascii":
        if not HAS_PLYFILE:
            raise NotImplementedError("binary PLY needs plyfile; ascii is supported natively")
        data = plyfile.PlyData.read(path)["vertex"]  # pragma: no cover
        # Preserve the header-declared dtypes (int stays int) instead of
        # flattening everything to float.
        is_float = {n: t in ("float", "double") for n, t in props}
        rows = [
            tuple(float(v) if is_float[n] else int(v) for v, (n, _) in zip(r, props))
            for r in data
        ]
        return spark.createDataFrame(rows, schema=", ".join(f"{n} {t}" for n, t in props))
    with open(path, encoding="ascii") as f:
        lines = f.read().splitlines()
    body = lines[lines.index("end_header") + 1 :][:n_rows]
    schema = ", ".join(f"{n} {t}" for n, t in props)
    casts = {"float", "double"}
    rows = []
    for line in body:
        vals = line.split()
        rows.append(
            tuple(
                float(v) if t in casts else int(v)
                for v, (_, t) in zip(vals, props)
            )
        )
    return spark.createDataFrame(rows, schema=schema)


def write_ply(df: DataFrame, path: str) -> None:
    """Write a DataFrame as ascii PLY (header from schema, element per row).

    Distributed formatting: rows become text JVM-side (``concat_ws``), only
    the final file concat happens on the driver (PLY is a single-file
    format — inherently a collect point, same as the reference's writer).
    """
    from pyspark.sql import functions as F

    cols = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    header = ["ply", "format ascii 1.0", f"element vertex {df.count()}"]
    for name, t in cols:
        if t not in _SPARK_TO_PLY:
            raise ValueError(f"column {name!r}: no faithful PLY type for Spark {t}")
        header.append(f"property {_SPARK_TO_PLY[t]} {name}")
    header.append("end_header")
    lines = df.select(F.concat_ws(" ", *[F.col(n).cast("string") for n, _ in cols]).alias("l"))
    with open(path, "w", encoding="ascii") as f:
        f.write("\n".join(header) + "\n")
        for (line,) in lines.toLocalIterator():
            f.write(line + "\n")
