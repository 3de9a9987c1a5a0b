"""Source/sink round-trips: Arrow IPC (executor-side) and ORC (built-in)."""

from pyspark.sql import functions as F

from agile_lakehouse_spark.sources import arrow_ipc
from agile_lakehouse_spark.sources.catalog import load_table


def test_arrow_ipc_roundtrip(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "customer").repartition(4)
    out = str(tmp_path / "ipc")
    manifest = arrow_ipc.write_ipc(df, out)
    assert 1 <= len(manifest) <= 4
    assert sum(n for _, n in manifest) == df.count()

    back = arrow_ipc.read_ipc(spark, out)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    a = sorted(r.c_custkey for r in back.select("c_custkey").collect())
    b = sorted(r.c_custkey for r in df.select("c_custkey").collect())
    assert a == b


def test_arrow_ipc_projection(spark, sf_dir, tmp_path):
    """Reader-side projection: only requested columns come back (the
    reference's chunk.read(projection) contract)."""
    df = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "ipc_proj")
    arrow_ipc.write_ipc(df, out)
    back = arrow_ipc.read_ipc(spark, out, columns=["n_name", "n_nationkey"])
    assert back.columns == ["n_name", "n_nationkey"]
    assert back.count() == df.count()


def test_arrow_ipc_empty_partitions_write_no_files(spark, tmp_path):
    df = spark.range(10).repartition(32)  # most partitions empty
    out = str(tmp_path / "ipc_empty")
    manifest = arrow_ipc.write_ipc(df, out)
    assert sum(n for _, n in manifest) == 10
    assert all(n > 0 for _, n in manifest)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC is a first-class built-in columnar alternative to parquet."""
    df = load_table(spark, sf_dir, "supplier")
    out = str(tmp_path / "orc")
    df.write.orc(out)
    back = spark.read.orc(out)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    got = back.agg(F.sum("s_acctbal")).collect()[0][0]
    want = df.agg(F.sum("s_acctbal")).collect()[0][0]
    assert abs(got - want) < 1e-6


def test_avro_datasource_availability(spark, tmp_path):
    """Capability pin: the Avro connector (external spark-avro module) is
    NOT deployed in this environment — interchange coverage is Parquet,
    ORC, Arrow IPC, CSV/JSONL, PLY, LAS.  If this test ever fails, Avro
    became available: add round-trip coverage alongside ORC's.
    """
    import pytest

    with pytest.raises(Exception, match="avro"):
        spark.range(3).write.format("avro").mode("overwrite").save(str(tmp_path / "a"))
