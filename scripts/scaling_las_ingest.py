"""Native LAS/LAZ ingest throughput through spark.read.format("las").

The S1-S4 chain at scale: synthesize a deterministic cloud, write real
``.las`` (and a smaller ``.laz``) with the native writers, scan through
the Python DataSource (one Spark task per chunk), reduce to count+AABB.

Two honest numbers fall out:

- ``.las``: one numpy frombuffer per chunk — I/O-bound, millions pts/s.
- ``.laz``: the vendored arithmetic decoder is PURE PYTHON state-machine
  code (LASzip is inherently sequential per chunk); its per-point cost
  is interpreter-bound.  Chunks decode in parallel (32 tasks), so
  wall-clock scales with points/chunks, but the constant is honest —
  production would swap laspy[lazrs] into the same chunk-planned scan.

    python scripts/scaling_las_ingest.py [n_las_points] [n_laz_points]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.sources import las_native, laz_native
from agile_lakehouse_spark.sources.las_datasource import LasDataSource


def synth(n: int) -> dict[str, np.ndarray]:
    i = np.arange(n, dtype=np.int64)
    return {
        "x": ((i * 2654435761) % 1000000) / 1000.0,
        "y": ((i * 40503 + 7) % 1000000) / 1000.0,
        "z": ((i * 69069 + 13) % 1000000) / 1000.0,
        "intensity": (i % 65536).astype(np.uint16),
        "classification": (i % 32).astype(np.uint8),
    }


def main() -> None:
    n_las = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_laz = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_session("scaling-las")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(LasDataSource)
    out: dict[str, object] = {"n_las": n_las, "n_laz": n_laz}

    d = tempfile.mkdtemp(prefix="las_ingest_")
    try:
        import os

        os.makedirs(f"{d}/las"), os.makedirs(f"{d}/laz")
        c = synth(n_las)
        t0 = time.time()
        las_native.write_las(
            f"{d}/las/big.las", c["x"], c["y"], c["z"],
            intensity=c["intensity"], classification=c["classification"],
        )
        out["las_write_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        df = spark.read.format("las").load(f"{d}/las")
        row = df.agg(F.count(F.lit(1)).alias("n"), F.min("x"), F.max("x")).collect()[0]
        assert row["n"] == n_las
        out["las_scan_s"] = round(time.time() - t0, 2)
        out["las_pts_per_s"] = round(n_las / out["las_scan_s"])
        shutil.rmtree(f"{d}/las")

        cz = synth(n_laz)
        t0 = time.time()
        laz_native.write_laz(f"{d}/laz/big.laz", cz)
        out["laz_write_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        dfz = spark.read.format("las").load(f"{d}/laz")
        rz = dfz.agg(F.count(F.lit(1)).alias("n"), F.min("x"), F.max("x")).collect()[0]
        assert rz["n"] == n_laz, (rz["n"], n_laz)
        out["laz_scan_s"] = round(time.time() - t0, 2)
        out["laz_pts_per_s"] = round(n_laz / out["laz_scan_s"])
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
