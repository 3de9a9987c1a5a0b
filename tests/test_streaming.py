"""Structured Streaming: windows, watermark, stateful dedup.

Streams are driven from file sources over a temp copy of the events
fixture, drained with availableNow triggers into memory sinks, and checked
against the equivalent batch aggregation (streams and batch must agree on
closed windows).
"""

import pytest
from pyspark.sql import functions as F

from agile_lakehouse_spark.sources.catalog import load_table
from agile_lakehouse_spark.streaming import windows


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").coalesce(2).write.mode("overwrite").parquet(dest)
    return dest


@pytest.fixture(scope="module")
def events_schema(spark, events_dir):
    return spark.read.parquet(events_dir).schema


def test_tumbling_stream_matches_batch(spark, events_dir, events_schema):
    stream = windows.read_events_stream(spark, events_dir, events_schema)
    agg = windows.tumbling_counts(windows.with_event_time(stream))
    windows.run_to_memory(agg, "tumbling_out", output_mode="complete")
    got = {
        (r.w_start, r.w_end): (r.n_events, round(r.sum_value, 6))
        for r in spark.table("tumbling_out").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {(r.w.start, r.w.end): (r.n, round(r.s, 6)) for r in batch}
    assert got == want


def test_sliding_stream_runs(spark, events_dir, events_schema):
    stream = windows.read_events_stream(spark, events_dir, events_schema)
    agg = windows.sliding_counts(windows.with_event_time(stream))
    windows.run_to_memory(agg, "sliding_out", output_mode="complete")
    rows = spark.table("sliding_out").collect()
    assert rows
    # hop < width -> every event lands in exactly width/slide = 2 windows
    total = sum(r.n_events for r in rows)
    assert total == 2 * spark.read.parquet(events_dir).count()


def test_session_windows(spark, events_dir, events_schema):
    stream = windows.read_events_stream(spark, events_dir, events_schema)
    agg = windows.session_counts(windows.with_event_time(stream), gap="5 minutes")
    windows.run_to_memory(agg, "session_out", output_mode="complete")
    rows = spark.table("session_out").collect()
    assert rows
    for r in rows:
        assert r.w_end > r.w_start and r.n_events >= 1


def test_streaming_dedup(spark, tmp_path, events_schema):
    src = str(tmp_path / "dups")
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:01", 5, "click", 1.0, "{}"),
         (1, "2024-01-01 00:00:02", 5, "click", 1.0, "{}"),
         (2, "2024-01-01 00:01:00", 6, "view", 2.0, "{}")],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value", "props")
    ev.coalesce(1).write.parquet(src)
    stream = windows.read_events_stream(spark, src, ev.schema)
    dd = windows.dedup_within_watermark(windows.with_event_time(stream), ["event_id"])
    windows.run_to_memory(dd, "dedup_out")
    out = spark.table("dedup_out").collect()
    assert sorted(r.event_id for r in out) == [1, 2]


def test_stream_to_grid_layout(spark, tmp_path):
    from agile_lakehouse_spark.sources.catalog import points_view
    from agile_lakehouse_spark.streaming import ingest

    src = str(tmp_path / "pts_src")
    pts = points_view(spark, "/root/testdata/sf0.001")
    pts.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    dest = str(tmp_path / "pts_layout")
    ingest.stream_to_grid_layout(stream, dest, str(tmp_path / "ckpt"), 200.0, 200.0)
    back = spark.read.parquet(dest)
    assert back.count() == pts.count()
    assert "cell_x" in back.columns and "cell_y" in back.columns


def test_running_user_counts_stateful(spark, tmp_path):
    from agile_lakehouse_spark.streaming import ingest, windows

    src = str(tmp_path / "ev_src")
    ev = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i%10:02d}:00", i % 3, "click", 1.0, "{}") for i in range(30)],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value", "props")
    ev.coalesce(1).write.parquet(src)
    stream = windows.read_events_stream(spark, src, ev.schema)
    counts = ingest.running_user_counts(stream)
    windows.run_to_memory(counts, "user_counts", output_mode="update")
    out = {r.user_id: r.n_events for r in spark.table("user_counts").collect()}
    assert out == {0: 10, 1: 10, 2: 10}


def test_stream_ingest_idempotent_per_batch(spark, tmp_path):
    """Re-delivering a micro-batch (checkpoint retry) must not duplicate
    rows: each batch lands in its own batch=<id> dir with overwrite."""
    from agile_lakehouse_spark.sources.catalog import points_view
    from agile_lakehouse_spark.streaming.ingest import stream_to_grid_layout

    src = str(tmp_path / "pts_src2")
    pts = points_view(spark, "/root/testdata/sf0.001").limit(1000)
    pts.coalesce(1).write.parquet(src)
    dest = str(tmp_path / "pts_layout2")
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    stream_to_grid_layout(stream, dest, str(tmp_path / "ckpt2"), 200.0, 200.0)
    n1 = spark.read.parquet(dest).count()
    # simulate the retry: run the same data as batch 0 again from a FRESH
    # checkpoint (same batch_id) — overwrite semantics keep counts stable
    stream2 = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    stream_to_grid_layout(stream2, dest, str(tmp_path / "ckpt3"), 200.0, 200.0)
    assert spark.read.parquet(dest).count() == n1


def test_stream_upsert_exactly_once(spark, tmp_path):
    """foreachBatch + txn markers: a replayed batch must not re-apply."""
    from agile_lakehouse_spark.plans.snapshots import TransactionalTable
    from agile_lakehouse_spark.streaming.ingest import stream_upsert

    src = str(tmp_path / "upsert_src")
    spark.createDataFrame([(i, i * 10) for i in range(20)], "k long, v long").coalesce(
        2
    ).write.parquet(src)
    table = TransactionalTable(str(tmp_path / "acid_tbl"))
    table.append(spark.createDataFrame([(0, -1), (100, -1)], "k long, v long"))

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    stream_upsert(stream, table, "k", str(tmp_path / "up_ckpt"))
    out = table.read(spark)
    assert out.count() == 21  # 20 upserted + untouched k=100
    assert out.filter("k = 0").collect()[0].v == 0  # updated, not duplicated
    v_after = table.latest_version()

    # simulate a batch replay: fresh checkpoint -> same batch ids replayed
    stream2 = spark.readStream.schema(schema).parquet(src)
    stream_upsert(stream2, table, "k", str(tmp_path / "up_ckpt2"))
    assert table.latest_version() == v_after  # skipped: no duplicate merge
    assert table.read(spark).count() == 21


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from agile_lakehouse_spark.streaming import windows

    src = str(tmp_path / "ssj_src")
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", i % 3, "click" if i % 2 else "view", float(i), "{}")
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value")
    ev.coalesce(2).write.parquet(src)

    batch = spark.read.parquet(src)
    b_clicks = batch.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    b_views = batch.filter("event_type = 'view'").select(
        F.col("event_id").alias("view_id"), "user_id", "ts", "value"
    )
    expected = sorted(
        (r.event_id, r.view_id)
        for r in b_clicks.alias("l")
        .join(
            b_views.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 15 minutes"))
            & (F.col("r.ts") <= F.col("l.ts")),
        )
        .select(F.col("l.event_id"), F.col("r.view_id"))
        .collect()
    )
    assert expected  # non-trivial fixture

    stream = spark.readStream.schema(batch.schema).parquet(src)
    s_clicks = stream.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    s_views = stream.filter("event_type = 'view'").select(
        F.col("event_id").alias("view_id"), "user_id", "ts", "value"
    )
    joined = windows.interval_join(s_clicks, s_views).select(
        F.col("l.event_id").alias("event_id"), F.col("r.view_id").alias("view_id")
    )
    windows.run_to_memory(joined, "ssj_out")
    got = sorted((r.event_id, r.view_id) for r in spark.table("ssj_out").collect())
    assert got == expected


def test_stream_to_incremental_view(spark, tmp_path):
    """Streaming append + per-batch incremental refresh: the view equals a
    full batch aggregate of everything streamed, stays fresh after a second
    stream, and a replayed stream changes nothing (exactly-once)."""
    from pyspark.sql import functions as F

    from agile_lakehouse_spark.plans.incremental import IncrementalAggregate
    from agile_lakehouse_spark.plans.snapshots import TransactionalTable
    from agile_lakehouse_spark.streaming.ingest import stream_to_incremental_view

    src = str(tmp_path / "iv_src")
    spark.createDataFrame(
        [(i % 4, float(i)) for i in range(40)], "k long, v double"
    ).coalesce(2).write.parquet(src)

    table = TransactionalTable(str(tmp_path / "iv_tbl"))
    view = IncrementalAggregate(
        table, str(tmp_path / "iv_view"), ["k"], {"n": ("count", "v"), "s": ("sum", "v")}
    )
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    stream_to_incremental_view(stream, table, view, str(tmp_path / "iv_ckpt"))

    got = {r.k: (r.n, r.s) for r in view.read(spark).collect()}
    want = {
        r.k: (r.n, r.s)
        for r in spark.read.parquet(src)
        .groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want
    v_table, v_view = table.latest_version(), view.view.latest_version()

    # replay with a fresh checkpoint: append skipped, view refresh a no-op
    stream2 = spark.readStream.schema(schema).parquet(src)
    stream_to_incremental_view(stream2, table, view, str(tmp_path / "iv_ckpt2"))
    assert table.latest_version() == v_table
    assert {r.k: (r.n, r.s) for r in view.read(spark).collect()} == want

    # more data through a second stream lineage -> view catches up incrementally
    src2 = str(tmp_path / "iv_src2")
    spark.createDataFrame([(9, 1.0), (9, 2.0)], "k long, v double").write.parquet(src2)
    stream3 = spark.readStream.schema(schema).parquet(src2)
    stream_to_incremental_view(stream3, table, view, str(tmp_path / "iv_ckpt3"), app_id="lineage2")
    got2 = {r.k: (r.n, r.s) for r in view.read(spark).collect()}
    assert got2[9] == (2, 3.0)
    assert all(got2[k] == want[k] for k in want)


def test_checkpoint_crash_resume_exactly_once(spark, tmp_path):
    """Crash DURING batch 1 (after batch 0 committed), restart from the
    SAME checkpoint: batch 0 is not reprocessed, batch 1 is retried, and
    the table ends with every row exactly once."""
    from agile_lakehouse_spark.plans.snapshots import TransactionalTable

    src = str(tmp_path / "crash_src")
    spark.createDataFrame([(i, i) for i in range(10)], "k long, v long").coalesce(1).write.parquet(src)
    spark.createDataFrame([(i, i) for i in range(10, 20)], "k long, v long").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    table = TransactionalTable(str(tmp_path / "crash_tbl"))
    ck = str(tmp_path / "crash_ck")
    schema = spark.read.parquet(src).schema
    app = "crash_test"

    def make_writer(fail_on_batch):
        def _apply(batch_df, batch_id):
            if batch_id == fail_on_batch:
                raise RuntimeError("injected crash mid-batch")
            if batch_id > table.last_txn_batch(app):
                table.append(batch_df, txn=(app, batch_id))
        return _apply

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        stream.writeStream.foreachBatch(make_writer(fail_on_batch=1))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        raise AssertionError("query should have crashed on batch 1")
    except Exception:
        pass
    assert table.read(spark).count() == 10  # batch 0 landed before the crash

    stream2 = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    q2 = (
        stream2.writeStream.foreachBatch(make_writer(fail_on_batch=None))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    got = sorted(r.k for r in table.read(spark).collect())
    assert got == list(range(20)), "exactly-once across crash-resume"


def test_stream_fp_dedup_matches_batch_distinct(spark, sf_dir):
    """dq171: the streaming content-fingerprint dedup must emit exactly
    the batch DISTINCT of the normalized fingerprint — same multiset,
    independent of arrival order (only the fp is emitted)."""
    from pyspark.sql import functions as F

    from agile_lakehouse_spark import declared

    got = sorted(
        r.norm_fp for r in declared.stream_fp_dedup_q(spark, sf_dir).collect()
    )
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.expr(
            declared.portable.hex15_spark(declared._NORM_SPARK)
        ).cast("bigint").alias("fp")
    )
    want = sorted(r.fp for r in batch.distinct().collect())
    assert got == want and len(got) > 0
