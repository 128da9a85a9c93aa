"""Oracle-checked batch equivalents of the Structured Streaming operators
(postgraph_spark.streaming.ops). Structured Streaming guarantees a
streaming query over an append source equals the same DataFrame program
run in batch — these registry entries pin the batch side to a DuckDB
oracle, and tests/test_streaming.py pins stream == batch, closing the
loop streaming == oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgraph_spark.queries.registry import register, t
from postgraph_spark.streaming import ops as S


@register(
    "stream_windowed_counts",
    """
    WITH w AS (
      SELECT time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)) AS ws,
             event_type, value
      FROM events)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(ws + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
    FROM w GROUP BY ws, event_type
    """,
)
def stream_windowed_counts(spark, sf_dir):
    """Tumbling-window event counts — the exact DataFrame program
    streaming/ops.py runs under a watermark on readStream (batch here:
    the watermark is a no-op, the aggregation is identical)."""
    out = S.windowed_event_counts(t(spark, sf_dir, "events"))
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


@register(
    "stream_sessionize",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    x AS (SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, ts, value,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
          FROM x)
    SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           user_id, count(*) AS n_events, round(sum(value), 6) AS session_value
    FROM s GROUP BY user_id, sid
    """,
)
def stream_sessionize(spark, sf_dir):
    """Native session windows (session_window merge state) — oracled by
    the classic gaps-and-islands rewrite: a session breaks where the gap
    to the previous event reaches the 10-minute threshold."""
    out = S.sessionize(t(spark, sf_dir, "events"), gap="10 minutes")
    return out.select(
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "user_id",
        "n_events",
        "session_value",
    )


@register(
    "stream_interval_join",
    """
    WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'purchase')
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id AS user_id,
           round(p.value, 6) AS purchase_value
    FROM c JOIN p ON p.user_id = c.user_id
               AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    """,
)
def stream_interval_join(spark, sf_dir):
    """Stream-stream interval join (attribution shape): every click
    paired with same-user purchases inside the next 10 minutes. The
    streaming form (streaming/ops.py interval_join) bounds its buffered
    state by watermark + join horizon; this is the identical batch
    program pinned to the oracle, and tests/test_streaming.py pins
    stream == batch."""
    e = t(spark, sf_dir, "events")
    out = S.interval_join(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    )
    return out.select(
        F.col("l_id").alias("click_id"),
        F.col("r_id").alias("purchase_id"),
        F.col("l_key").alias("user_id"),
        F.round("r_value", 6).alias("purchase_value"),
    )


@register(
    "stream_interval_left_join",
    """
    WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'purchase')
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id AS user_id,
           round(p.value, 6) AS purchase_value
    FROM c LEFT JOIN p ON p.user_id = c.user_id
               AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    """,
)
def stream_interval_left_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join: every click paired with
    same-user purchases in the next 10 minutes, UN-attributed clicks
    emitted with NULL purchase columns — the outer variant Structured
    Streaming supports because the watermark + time-range condition
    prove when no future match can arrive (state expires, null row
    emits). Identical batch program under the oracle; stream == batch
    pinned in tests/test_streaming.py with a watermark-flush sentinel."""
    e = t(spark, sf_dir, "events")
    out = S.interval_join(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
        how="left_outer",
    )
    return out.select(
        F.col("l_id").alias("click_id"),
        F.col("r_id").alias("purchase_id"),
        F.col("l_key").alias("user_id"),
        F.round("r_value", 6).alias("purchase_value"),
    )


@register(
    "stream_sliding_counts",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    w AS (
      SELECT user_id, time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL (g.k * 5) MINUTE AS ws
      FROM e CROSS JOIN generate_series(0, 1) AS g(k))
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           user_id, count(*) AS n_events
    FROM w GROUP BY ws, user_id
    """,
)
def stream_sliding_counts(spark, sf_dir):
    """Sliding-window per-user activity (streaming/ops.py
    sliding_user_activity: 10-minute windows sliding by 5): every event
    lands in exactly window/slide = 2 overlapping windows, so the oracle
    assigns each event to its bucket and the bucket one slide earlier.
    Batch == stream under the append-source guarantee (tests/
    test_streaming.py pins the streaming side)."""
    out = S.sliding_user_activity(t(spark, sf_dir, "events"))
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "user_id",
        "n_events",
    )


@register(
    "stream_dedup_events",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_events(spark, sf_dir):
    """Watermarked streaming dedup (streaming/ops.py stream_dedup —
    dropDuplicates with watermark-expired key state). Batch form of the
    same plan is exact DISTINCT on the dedup key, which is what the
    oracle checks; the streaming-only property (duplicates arriving in
    later micro-batches are dropped while state expires past the
    watermark) is pinned by tests/test_streaming.py:test_stream_dedup.
    Keyed state hash-partitions across executors; watermark bounds it."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return S.stream_dedup(ev, keys=["user_id", "event_type"]).select(
        "user_id", "event_type"
    )


@register(
    "stream_cms_counts",
    """
    WITH cells AS (
      SELECT t.r AS row_,
             CAST(('0x' || substr(md5(CAST(t.r AS VARCHAR) || ':'
                                      || event_type || ':'
                                      || CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1024 AS bucket
      FROM events CROSS JOIN range(4) t(r)
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL)
    SELECT CAST(row_ AS INT) AS row, CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM cells GROUP BY row_, bucket
    """,
)
def stream_cms_counts(spark, sf_dir):
    """Count-min sketch over the event stream (streaming/ops.py
    cms_event_counts): the d x w counter table for (event_type, user)
    items — the capped-state streaming frequency store (counter
    addition is associative + commutative, so the incremental streaming
    aggregation equals this batch program exactly;
    tests/test_streaming.py pins stream == batch). md5-derived buckets
    make both engines' counters identical integers."""
    out = S.cms_event_counts(t(spark, sf_dir, "events"))
    return out.select(
        F.col("row").cast("int").alias("row"),
        F.col("bucket").cast("int").alias("bucket"),
        "cnt",
    )


@register(
    "stream_dim_enrich",
    """
    WITH e AS (SELECT time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)) AS ws,
                      user_id, value
               FROM events),
    j AS (SELECT e.ws, c.c_nationkey, e.value
          FROM e JOIN customer c ON c.c_custkey = e.user_id)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           c_nationkey, count(*) AS n_events, round(sum(value), 6) AS sum_value
    FROM j GROUP BY ws, c_nationkey
    """,
)
def stream_dim_enrich(spark, sf_dir):
    """Stream-static enrichment (streaming/ops.py enrich_with_dim): the
    event stream joins to the STATIC customer dimension (broadcast hash
    join re-planned per micro-batch — no join state), then rolls up
    count/sum per 5-minute tumbling window and nation. Batch form of the
    identical plan is checked here; tests/test_streaming.py pins
    stream == batch under the append-source guarantee."""
    out = S.enrich_with_dim(
        t(spark, sf_dir, "events"), t(spark, sf_dir, "customer")
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "c_nationkey",
        "n_events",
        "sum_value",
    )
