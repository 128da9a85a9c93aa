"""Structured Streaming operators: stream results must equal the batch
computation over the same data (the batch/stream equivalence Structured
Streaming guarantees for append sources + availableNow drains)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from postgraph_spark.sources.relational import load_table
from postgraph_spark.streaming import ops as S

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """events sf0.001 re-written as 3 parquet chunks (simulated arrivals)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, "events", SF_DIR)
    n = ev.count()
    ev1 = ev.filter(F.col("event_id") % 3 == 0)
    ev2 = ev.filter(F.col("event_id") % 3 == 1)
    ev3 = ev.filter(F.col("event_id") % 3 == 2)
    for i, chunk in enumerate((ev1, ev2, ev3)):
        chunk.coalesce(1).write.mode("append").parquet(d)
    return d


def rows_sorted(df_or_rows):
    rows = df_or_rows.collect() if hasattr(df_or_rows, "collect") else df_or_rows
    return sorted(map(tuple, rows))


def test_windowed_counts_stream_equals_batch(spark, event_dir):
    stream = S.read_event_stream(spark, event_dir, max_files_per_trigger=1)
    S.run_to_memory(S.windowed_event_counts(stream), "win_counts")
    got = rows_sorted(spark.table("win_counts"))
    batch = load_table(spark, "events", SF_DIR)
    want = rows_sorted(S.windowed_event_counts(batch))
    assert got == want
    assert len(got) > 0


def test_sliding_window_stream_equals_batch(spark, event_dir):
    stream = S.read_event_stream(spark, event_dir)
    S.run_to_memory(S.sliding_user_activity(stream), "slide_counts")
    got = rows_sorted(spark.table("slide_counts"))
    want = rows_sorted(S.sliding_user_activity(load_table(spark, "events", SF_DIR)))
    assert got == want


def test_stream_dedup(spark, event_dir, tmp_path):
    # duplicate every event into a second chunk file; dedup must restore
    # the original cardinality
    d = str(tmp_path / "dup_events")
    ev = load_table(spark, "events", SF_DIR)
    ev.coalesce(1).write.mode("append").parquet(d)
    ev.coalesce(1).write.mode("append").parquet(d)
    stream = S.read_event_stream(spark, d)
    S.run_to_memory(S.stream_dedup(stream), "dedup_out", output_mode="append")
    assert spark.table("dedup_out").count() == ev.count()


def test_sessionize_stream_equals_batch(spark, event_dir):
    stream = S.read_event_stream(spark, event_dir)
    S.run_to_memory(S.sessionize(stream, gap="10 minutes"), "sessions")
    got = rows_sorted(spark.table("sessions"))
    want = rows_sorted(S.sessionize(load_table(spark, "events", SF_DIR), gap="10 minutes"))
    assert got == want
    assert len(got) > 0


def test_running_user_stats_stateful(spark, event_dir):
    stream = S.read_event_stream(spark, event_dir)
    S.run_to_memory(S.running_user_stats(stream), "run_stats", output_mode="update")
    # final per-user update must equal the batch totals; with multiple
    # micro-batches the memory sink keeps every update row, so take the
    # row with the max n_events per user
    upd = spark.table("run_stats")
    final = (
        upd.groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "total_value"), "n_events").alias("s"))
        .select("user_id", F.col("s.n_events").alias("n_events"), F.col("s.total_value").alias("total_value"))
    )
    batch = (
        load_table(spark, "events", SF_DIR)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
    )
    assert rows_sorted(final) == rows_sorted(batch)


def test_interval_join_stream_equals_batch(spark, event_dir):
    """Stream-stream interval join (watermark-bounded buffer): the
    streaming result equals the identical batch join."""
    stream = S.read_event_stream(spark, event_dir, max_files_per_trigger=1)
    clicks = stream.filter(F.col("event_type") == "click")
    buys = stream.filter(F.col("event_type") == "purchase")
    S.run_to_memory(S.interval_join(clicks, buys), "ij_out", output_mode="append")
    got = rows_sorted(spark.table("ij_out"))
    batch = load_table(spark, "events", SF_DIR)
    want = rows_sorted(
        S.interval_join(
            batch.filter(F.col("event_type") == "click"),
            batch.filter(F.col("event_type") == "purchase"),
        )
    )
    assert got == want and len(want) > 0


def test_dim_enrich_stream_equals_batch(spark, event_dir):
    dim = load_table(spark, "customer", SF_DIR)
    stream = S.read_event_stream(spark, event_dir, max_files_per_trigger=1)
    S.run_to_memory(S.enrich_with_dim(stream, dim), "dim_enrich")
    got = rows_sorted(spark.table("dim_enrich"))
    want = rows_sorted(S.enrich_with_dim(load_table(spark, "events", SF_DIR), dim))
    assert got == want
    assert len(got) > 0


def test_dim_enrich_is_broadcast_join(spark):
    # the static dimension must broadcast — a shuffle join would
    # re-shuffle the stream every micro-batch
    dim = load_table(spark, "customer", SF_DIR)
    out = S.enrich_with_dim(load_table(spark, "events", SF_DIR), dim)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_interval_left_join_stream_equals_batch(spark, event_dir, tmp_path):
    """LEFT OUTER stream-stream interval join: outer (null-padded) rows
    emit only when the watermark proves no match can arrive, so the
    stream gets a far-future sentinel event that pushes the watermark
    past every click's horizon before the drain ends."""
    d = str(tmp_path / "events_with_sentinel")
    ev = load_table(spark, "events", SF_DIR)
    ev.coalesce(1).write.mode("append").parquet(d)
    # TWO sentinel files: the first advances the watermark past every
    # click's horizon; the second triggers one more micro-batch in which
    # the (already advanced) watermark evicts state and emits the
    # remaining outer rows. The sentinels must be CLICKS — the watermark
    # is tracked per join input AFTER the event_type filter, so a
    # foreign-typed sentinel would never reach the watermark node.
    for days in (10, 20):
        sentinel = ev.agg(
            F.lit(-days).alias("event_id"),
            (F.max("ts") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
            F.lit(-1).alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        sentinel = ev.sparkSession.createDataFrame(sentinel.collect(), ev.schema)
        sentinel.coalesce(1).write.mode("append").parquet(d)

    stream = S.read_event_stream(spark, d, max_files_per_trigger=1)
    clicks = stream.filter(F.col("event_type") == "click")
    buys = stream.filter(F.col("event_type") == "purchase")
    S.run_to_memory(
        S.interval_join(clicks, buys, how="left_outer"), "lij_out",
        output_mode="append",
    )
    # drop the sentinel clicks (negative ids) — the batch side has none
    got = [r for r in rows_sorted(spark.table("lij_out")) if r[0] >= 0]
    batch = load_table(spark, "events", SF_DIR)
    want = rows_sorted(
        S.interval_join(
            batch.filter(F.col("event_type") == "click"),
            batch.filter(F.col("event_type") == "purchase"),
            how="left_outer",
        )
    )
    assert got == want
    # the outer rows are the point: some clicks must be unmatched
    assert any(r[5] is None for r in want), "fixture has no unmatched clicks"


def test_cms_stream_equals_batch(spark, event_dir):
    """counter addition is associative+commutative, so the sketch built
    incrementally across micro-batches equals the batch sketch cell for
    cell."""
    stream = S.read_event_stream(spark, event_dir, max_files_per_trigger=1)
    S.run_to_memory(S.cms_event_counts(stream), "cms_cells")
    got = rows_sorted(spark.table("cms_cells"))
    want = rows_sorted(S.cms_event_counts(load_table(spark, "events", SF_DIR)))
    assert got == want and len(got) > 0
    # state cap: never more than d*w cells regardless of stream length
    assert len(got) <= 4 * 1024


def test_cms_excludes_null_keyed_events(spark):
    """NULL event_type/user_id rows must not be sketched: concat_ws would
    silently collapse ('click', NULL) into item 'click'; the explicit
    filter + NULL-propagating concat drops them on both engine and
    oracle sides."""
    from postgraph_spark.streaming.ops import cms_event_counts

    full = spark.createDataFrame(
        [("click", 1), ("click", 1), ("view", 2)], ["event_type", "user_id"]
    )
    with_nulls = spark.createDataFrame(
        [("click", 1), ("click", 1), ("view", 2), ("click", None), (None, 3)],
        "event_type string, user_id int",
    )
    a = sorted(map(tuple, cms_event_counts(full).collect()))
    b = sorted(map(tuple, cms_event_counts(with_nulls).collect()))
    assert a == b
