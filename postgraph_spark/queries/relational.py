"""Relational operator inventory (SURVEY.md §2.1/2.3/2.4/2.5/2.6).

Each query exercises one operator family with an exact DuckDB oracle.
Conventions for hash-stable cross-engine comparison:
- every computed double is ``round(x, k)`` identically on both sides;
- LIMIT/top-N queries order by a unique key tie-breaker;
- timestamps in output are formatted to strings identically.

Scale notes are inline: joins to region/nation are broadcastable at any
SF; large aggregations rely on partial (map-side) aggregation which Spark
applies automatically to all algebraic aggregates used here.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from postgraph_spark.queries.registry import register, t


# ---------------------------------------------------------------- scans + agg

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 3) AS sum_qty,
           round(sum(l_extendedprice), 3) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 3) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: full scan + hash aggregate. Partial aggregation
    makes the shuffle tiny (|groups| rows per task) at any scale."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 3).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 3).alias("sum_base_price"),
            F.round(F.sum(disc_price), 3).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 3).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_orders",
    """
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 3) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> fact joins -> agg -> top-N.
    customer(filtered) is broadcast; lineitem join shuffles on orderkey."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 3).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 3) AS revenue
    FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: snowflake join. nation/region broadcast; the
    s_nationkey = c_nationkey theta-condition rides on the suppkey
    equi-join, so no extra shuffle."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 3).alias("revenue"))
    )


@register(
    "dim_broadcast_agg",
    """
    SELECT r.r_name, count(*) AS n_customers, round(avg(c.c_acctbal), 4) AS avg_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def dim_broadcast_agg(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"))
    )


# ------------------------------------------------------------- semi/anti join

@register(
    "semi_join_exists",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def semi_join_exists(spark, sf_dir):
    """EXISTS sublink -> left-semi join (SURVEY §2.6; reference
    transform_sub_link, cypher_expr.c:82)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join_not_exists",
    """
    SELECT c.c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_not_exists(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@register(
    "left_outer_join",
    """
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 3) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def left_outer_join(spark, sf_dir):
    """OPTIONAL MATCH semantics: left outer join preserving unmatched rows
    (reference JOIN_LEFT, cypher_clause.c:2440)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 3).alias("total_spent"),
        )
    )


# ------------------------------------------------------------------ stats agg

@register(
    "agg_stats",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(stddev_pop(l_quantity), 4) AS sdp_qty,
           round(var_samp(l_extendedprice), 2) AS var_price,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qp,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    """stdev/stdevp/corr/covar family (reference
    sql/postgraph-aggregation.sql.in:102-123,353-389)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.stddev_pop("l_quantity"), 4).alias("sdp_qty"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covs_qp"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covp_qp"),
    )


@register(
    "regr_family",
    """
    SELECT l_linestatus,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx,
           round(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem GROUP BY l_linestatus
    """,
)
def regr_family(spark, sf_dir):
    """regr_* aggregates (reference sql/postgraph-aggregation.sql.in:407-533)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.round(F.regr_avgx("l_extendedprice", "l_quantity"), 4).alias("avgx"),
        F.round(F.regr_avgy("l_extendedprice", "l_quantity"), 4).alias("avgy"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


@register(
    "percentile_quantiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
           round(median(l_extendedprice), 4) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_quantiles(spark, sf_dir):
    """percentilecont (reference sql.in:227; gtype.c:2427-2632). Exact
    interpolated percentile — Spark `percentile` == DuckDB quantile_cont."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", 0.9), 4).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", 0.25), 4).alias("p25_price"),
        F.round(F.median("l_extendedprice"), 4).alias("med_price"),
    )


@register(
    "collect_list_agg",
    """
    SELECT n.n_name, array_to_string(list_sort(list(DISTINCT c.c_mktsegment)), '|') AS segments,
           count(*) AS n
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def collect_list_agg(spark, sf_dir):
    """collect() aggregate (reference sql.in:259-330) — list output sorted
    and joined to a string so the comparator can hash it."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), "|").alias("segments"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "distinct_count",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_count(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# -------------------------------------------------------------------- windows

@register(
    "window_topn",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 3) AS price,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def window_topn(spark, sf_dir):
    """Top-N per group: the window pattern that replaces per-group sorts.
    Unique o_orderkey tie-break keeps row_number deterministic."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 3).alias("price"),
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3) AS run_sum
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select("o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 3).alias("run_sum"))


@register(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           round(lag(o_totalprice) OVER w, 3) AS prev_price,
           round(lead(o_totalprice) OVER w, 3) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark, sf_dir):
    """lag/lead + named WINDOW clause (reference g.y:17418-17620)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 3).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 3).alias("next_price"),
    )


@register(
    "window_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame (value-based; reference frame grammar g.y:17484-17565)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice")).rangeBetween(-10000, W.currentRow)
    return o.select("o_custkey", "o_orderkey", F.count(F.lit(1)).over(w).alias("n_in_band"))


@register(
    "window_rank_dense",
    """
    SELECT c_mktsegment, c_custkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY round(c_acctbal, 2) DESC, c_custkey)
    """,
)
def window_rank_dense(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.round("c_acctbal", 2).desc(), F.col("c_custkey"))
    wq = W.partitionBy("c_mktsegment").orderBy("c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(wq).alias("quartile"),
    )


# -------------------------------------------------------------------- set ops

@register(
    "setop_union",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 7000
    UNION
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def setop_union(spark, sf_dir):
    """UNION [DISTINCT] (reference transform_cypher_union, c.c:445-560)."""
    c = t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 7000).select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.union(b).distinct()


@register(
    "setop_union_all",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 7000
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def setop_union_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 7000).select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.union(b)


@register(
    "setop_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def setop_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("c_custkey"))
    return c.intersect(o)


@register(
    "setop_except",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def setop_except(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("c_custkey"))
    # subtract = EXCEPT DISTINCT: any right match removes the left row
    # entirely (exceptAll().distinct() would be multiset difference)
    return c.subtract(o)


# ----------------------------------------------------- UNWIND / explode (SRF)

@register(
    "unwind_word_count",
    """
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    """,
)
def unwind_word_count(spark, sf_dir):
    """UNWIND = explode (reference unnest SRF, cypher_clause.c:984-1040)."""
    p = t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --------------------------------------------- grouping sets / rollup / cube

@register(
    "rollup_orders",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n, round(sum(o_totalprice), 3) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark, sf_dir):
    """ROLLUP (reference g.y:4441-4490, transform_group_clause c.c:164)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 3).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "cube_lineitem",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
           count(*) AS n, round(sum(l_quantity), 3) AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 3).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "qty",
        )
    )


@register(
    "grouping_sets_events",
    """
    SELECT coalesce(event_type, 'ALL') AS etype,
           coalesce(CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT), -1) AS dow,
           count(*) AS n, round(sum(value), 3) AS total
    FROM events
    GROUP BY GROUPING SETS ((event_type), (isodow(CAST(ts AS TIMESTAMP))))
    """,
)
def grouping_sets_events(spark, sf_dir):
    """explicit GROUPING SETS via Spark SQL (g.y:4441-4490)."""
    t(spark, sf_dir, "events").createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT coalesce(event_type, 'ALL') AS etype,
               coalesce(CAST(weekday(ts) + 1 AS BIGINT), -1) AS dow,
               count(*) AS n, round(sum(value), 3) AS total
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (weekday(ts) + 1))
        """
    )


@register(
    "having_clause",
    """
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 3) AS spent
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 15 AND sum(o_totalprice) > 1000000
    """,
)
def having_clause(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("_spent"))
        .filter((F.col("n_orders") >= 15) & (F.col("_spent") > 1000000))
        .select("o_custkey", "n_orders", F.round("_spent", 3).alias("spent"))
    )


@register(
    "agg_filter_where",
    """
    SELECT c_nationkey,
           count(*) FILTER (WHERE c_acctbal > 0) AS n_positive,
           round(sum(c_acctbal) FILTER (WHERE c_mktsegment = 'MACHINERY'), 3) AS machinery_bal,
           count(*) AS n
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_filter_where(spark, sf_dir):
    """FILTER (WHERE ...) on aggregates (reference g.y:17399-17403)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("_af_customer")
    return spark.sql(
        """
        SELECT c_nationkey,
               count(*) FILTER (WHERE c_acctbal > 0) AS n_positive,
               round(sum(c_acctbal) FILTER (WHERE c_mktsegment = 'MACHINERY'), 3) AS machinery_bal,
               count(*) AS n
        FROM _af_customer GROUP BY c_nationkey
        """
    )


# -------------------------------------------------------- scalar expressions

@register(
    "case_when_buckets",
    """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def case_when_buckets(spark, sf_dir):
    """CASE WHEN (reference g.y:18013-18080)."""
    o = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
    )


@register(
    "string_funcs",
    """
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           length(c_name) AS name_len,
           substr(c_name, 10, 9) AS name_num,
           replace(c_name, 'Customer', 'Cust') AS short_name,
           reverse(c_mktsegment) AS rseg,
           concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS tagged,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           split_part(c_name, '#', 2) AS after_hash,
           ltrim(rtrim(concat('  ', c_name, ' '))) AS trimmed,
           CASE WHEN c_name LIKE 'Customer%' THEN 1 ELSE 0 END AS is_cust,
           CASE WHEN regexp_matches(c_name, '^Customer#[0-9]+$') THEN 1 ELSE 0 END AS re_ok,
           md5(c_name) AS name_md5
    FROM customer WHERE c_custkey < 200
    """,
)
def string_funcs(spark, sf_dir):
    """String function family (reference gtype_string.c — toupper tolower
    trim left right substring split replace like regex md5/sha)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 10, 9).alias("name_num"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.reverse(F.col("c_mktsegment")).alias("rseg"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")).alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
        F.ltrim(F.rtrim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" ")))).alias("trimmed"),
        F.when(F.col("c_name").like("Customer%"), 1).otherwise(0).alias("is_cust"),
        F.when(F.col("c_name").rlike("^Customer#[0-9]+$"), 1).otherwise(0).alias("re_ok"),
        F.md5("c_name").alias("name_md5"),
    )


@register(
    "math_funcs",
    """
    SELECT p_partkey,
           round(sqrt(p_retailprice), 4) AS sqrt_price,
           round(ln(p_retailprice), 6) AS ln_price,
           round(log10(p_retailprice), 6) AS log10_price,
           round(pow(p_size, 2), 1) AS size_sq,
           CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
           CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
           abs(p_size - 25) AS abs_dev,
           CAST(sign(p_size - 25) AS BIGINT) AS sign_dev,
           mod(p_size, 7) AS size_mod,
           round(exp(p_size / 50.0), 6) AS exp_size,
           round(cbrt(p_retailprice), 6) AS cbrt_price,
           round(sin(p_size), 6) AS sin_size,
           round(atan2(p_size, 3), 6) AS atan2_size,
           round(degrees(atan(p_size)), 4) AS deg_atan,
           round(radians(p_size), 6) AS rad_size
    FROM part WHERE p_partkey < 500
    """,
)
def math_funcs(spark, sf_dir):
    """Math function family (reference gtype_numbers.c)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.round(F.sqrt("p_retailprice"), 4).alias("sqrt_price"),
        F.round(F.log("p_retailprice"), 6).alias("ln_price"),
        F.round(F.log10("p_retailprice"), 6).alias("log10_price"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        F.ceil("p_retailprice").alias("ceil_price"),
        F.floor("p_retailprice").alias("floor_price"),
        F.abs(F.col("p_size") - 25).alias("abs_dev"),
        F.signum(F.col("p_size") - 25).cast("long").alias("sign_dev"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.round(F.exp(F.col("p_size") / 50.0), 6).alias("exp_size"),
        F.round(F.cbrt("p_retailprice"), 6).alias("cbrt_price"),
        F.round(F.sin("p_size"), 6).alias("sin_size"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.lit(3.0)), 6).alias("atan2_size"),
        F.round(F.degrees(F.atan("p_size")), 4).alias("deg_atan"),
        F.round(F.radians("p_size"), 6).alias("rad_size"),
    )


@register(
    "temporal_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(isodow(o_orderdate) AS BIGINT) AS dow_iso,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
    FROM orders WHERE o_orderkey < 1000
    """,
)
def temporal_funcs(spark, sf_dir):
    """Temporal family (reference gtype_temporal.c: extract date_part
    date_trunc age make_date...)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("dow_iso"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
    )


@register(
    "time_bucket_events",
    """
    SELECT strftime(time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type, count(*) AS n, round(sum(value), 3) AS total
    FROM events GROUP BY 1, 2
    """,
)
def time_bucket_events(spark, sf_dir):
    """date_bin / time-bucketed aggregation (reference date_bin,
    gtype_temporal.c). Spark window() is the streaming-compatible form."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("total"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n",
            "total",
        )
    )


@register(
    "events_json_extract",
    """
    SELECT event_type,
           round(avg(CAST(props->>'k' AS BIGINT)), 4) AS avg_k,
           max(CAST(props->>'k' AS BIGINT)) AS max_k,
           min(CAST(props->>'k' AS BIGINT)) AS min_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def events_json_extract(spark, sf_dir):
    """Schemaless property access (gtype `->` operator, gtype.c:1621-1832):
    JSON string column -> typed accessor, pushed into a JVM expression."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.min(k).alias("min_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "order_skip_limit",
    """
    SELECT o_orderkey, round(o_totalprice, 3) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def order_skip_limit(spark, sf_dir):
    """ORDER BY + SKIP/LIMIT (reference g.y:5002-5097)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 3).alias("price"))
        .offset(10)
        .limit(20)
    )


@register(
    "in_list_predicate",
    """
    SELECT o_orderpriority, count(*) AS n FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_orderpriority NOT IN ('5-LOW')
    GROUP BY o_orderpriority
    """,
)
def in_list_predicate(spark, sf_dir):
    """IN-list (reference `@=`, gtype.c:1833-1892)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("O", "F") & ~F.col("o_orderpriority").isin("5-LOW"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "null_handling",
    """
    SELECT c.c_custkey,
           o.o_orderkey IS NULL AS no_order,
           coalesce(round(o.o_totalprice, 3), -1.0) AS price_or_default
    FROM customer c LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
    WHERE c.c_custkey < 300
    """,
)
def null_handling(spark, sf_dir):
    """IS NULL / COALESCE three-valued logic (reference g.y:17041-17070)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, o.o_custkey == c.c_custkey, "left_outer").select(
        "c_custkey",
        F.col("o_orderkey").isNull().alias("no_order"),
        F.coalesce(F.round("o_totalprice", 3), F.lit(-1.0)).alias("price_or_default"),
    )
