"""Structured Streaming operators over the events stream.

The reference has NO streaming surface (SURVEY.md §2.9 — it is a Postgres
extension); these are the additive stream-processing capabilities a
large-scale ingest pipeline needs, built on Structured Streaming so the
same DataFrame expressions run identically in batch and stream:

- file-source ingest of an append-only event directory,
- tumbling / sliding windowed aggregation with watermark-bounded state,
- streaming deduplication (exact within watermark),
- session windows (native ``session_window``),
- a custom stateful operator via ``applyInPandasWithState`` (running
  per-key accumulators with processing-time timeout).

Scale notes: every operator keys its state (user_id / window / dedup key)
so state is hash-partitioned across executors; watermarks bound state
size; no driver-side state anywhere. At 100 TB/day the same topology runs
with a Kafka source instead of files — the transformations are unchanged.

Shared rounding convention (all sum-of-doubles outputs here and in their
oracles): ``round(sum(value), 6)`` on BOTH engines. Spark's partial-agg
summation order is nondeterministic and differs from DuckDB's
sequential fold; 6-decimal rounding absorbs the reassociation error at
these magnitudes. If a group's sum ever lands within ~1 ulp of a
rounding boundary and flakes the oracle hash, the documented escalation
is to sum as DECIMAL(38,12) on both sides (cast before aggregation) —
exact, order-independent, slower.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the events table schema (ts normalized to microsecond timestamps —
#: sources.relational.load_table does the nanos conversion for batch;
#: stream ingest expects already-normalized parquet/json)
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "parquet", max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source ingest of an append-only event directory."""
    reader = spark.readStream.schema(EVENT_SCHEMA).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def windowed_event_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data bound.

    Watermark caps state: windows older than max(ts) - watermark are
    finalized and dropped. Works identically on a batch DataFrame (the
    watermark is a no-op there) — tests exploit that equivalence.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_user_activity(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Sliding-window per-user activity (each event lands in
    window/slide overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n_events")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    horizon: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream INTERVAL join: pair each left event with the right
    events of the same key whose timestamp falls in
    (left.ts, left.ts + horizon]. Both sides carry a watermark and the
    join condition bounds the event-time range, so Structured Streaming
    can expire buffered rows once the watermark passes the horizon —
    bounded state, the canonical attribution-join shape (click ->
    purchase within N minutes). Works identically on batch DataFrames
    (the watermark is a no-op there).

    how='left_outer' emits null-padded rows for UNMATCHED left events —
    the un-attributed-click shape. Streaming caveat (Structured
    Streaming semantics, not ours): an outer row is emitted only once
    the watermark proves no future match can arrive, so a drained
    finite stream holds back outer rows near its end unless a later
    event advances the watermark past max(l_ts) + horizon
    (tests/test_streaming.py pins stream == batch with such a
    sentinel)."""
    l = left.withWatermark("ts", watermark).select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_id"),
        F.col("value").alias("l_value"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"),
        F.col("value").alias("r_value"),
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on_left: str = "user_id",
    on_right: str = "c_custkey",
    dim_cols: tuple[str, ...] = ("c_nationkey",),
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-STATIC enrichment join + windowed rollup: the event stream
    joins to a static dimension table, then aggregates per tumbling
    window and dimension attribute — the canonical ingest-enrichment
    topology (fact stream x dimension broadcast).

    Scale shape: a stream-static join keeps NO join state — Structured
    Streaming re-plans the static side each micro-batch, and the
    explicit broadcast() pins the dimension to the executors, so each
    micro-batch is a map-side hash join; only the windowed aggregation
    carries (watermark-bounded) state. At 100 TB/day the dimension
    refresh is a Delta snapshot re-read; the topology is unchanged."""
    d = dim.select(F.col(on_right).alias(on_left), *dim_cols)
    return (
        events.withWatermark("ts", watermark)
        .join(F.broadcast(d), on_left)
        .groupBy(F.window("ts", window).alias("w"), *dim_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *dim_cols,
            "n_events",
            "sum_value",
        )
    )


def cms_event_counts(
    events: DataFrame, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch maintained INCREMENTALLY over the event stream:
    item = event_type ':' user_id, counters = the d x w cell table
    (operators/sketches.cms_bucket hashing). Counter addition is
    associative and commutative, so the streaming aggregation (complete
    mode) equals the batch sketch exactly — the sketch never needs the
    raw stream replayed, and its state is CAPPED at d*w cells no matter
    how many events arrive (the property that makes sketches the right
    streaming frequency store).

    Scale shape: explode d cells per event map-side, one bounded-key
    stateful aggregation; at any throughput the shuffle carries partial
    sums over at most d*w keys.

    NULL policy: events with a NULL event_type or user_id are EXCLUDED
    (explicit filter + NULL-propagating concat, not concat_ws which
    silently skips NULL parts and would count 'click:<null>' as item
    'click') — the same filter the SQL oracle applies, so both engines
    sketch the identical item set."""
    from postgraph_spark.operators.sketches import cms_bucket

    item = F.concat(F.col("event_type"), F.lit(":"), F.col("user_id").cast("string"))
    events = events.where(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    cells = events.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    cms_bucket(item, r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("c")
    ).select("c.row", "c.bucket")
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def stream_dedup(events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes") -> DataFrame:
    """Exact streaming dedup on key columns within the watermark horizon.

    State = one entry per key seen, expired past the watermark — the
    streaming analog of the batch exact-dedup groupBy."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicates(keys)


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user: events closer than `gap` chain into one
    session (native session_window — state merges adjacent windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("session_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


# ------------------------------------------------- custom stateful operator

RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def running_user_stats(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful op: per-user running totals via
    applyInPandasWithState (Arrow-batched, keyed state).

    ``idle_timeout_ms`` expires idle keys (bounds state growth) in a
    continuously-running deployment. Default None = NoTimeout: a
    processing-time timeout keeps a trigger(availableNow) drain alive
    forever (the engine schedules empty 'state cleanup' batches until
    keys expire, so the query never self-terminates — and
    processAllAvailable blocks on the same condition).

    The state function is a local closure so cloudpickle ships it BY
    VALUE — executor Python workers never need this package importable.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_ms else GroupStateTimeout.NoTimeout
    )

    def running_stats_fn(key, pdf_iter, state):
        # per-user running (count, sum); each micro-batch emits the
        # updated running totals for keys that saw data
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            running_stats_fn,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )


def run_to_memory(stream_df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drain all available input into an in-memory table (test/dev sink);
    returns the StreamingQuery after it has processed everything.

    Caveat: the drained query must not use processing-time state
    timeouts — those keep scheduling 'state cleanup' batches, so neither
    awaitTermination nor processAllAvailable ever returns (see
    running_user_stats)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
