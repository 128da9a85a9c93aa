"""WITH-clause decorations from Cypher text (cypher_gram.y:5099-5171):
explicit GROUP BY / HAVING, named WINDOW definitions, OVER specs with
frames, FILTER (WHERE ...) on aggregates, WITHIN GROUP ordered-set
aggregates, and window navigation functions."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH decorations")
    e.execute("USE GRAPH decorations")
    # 2 groups x 3 values with known stats
    e.execute(
        "CREATE (:m {g: 'a', v: 10}), (:m {g: 'a', v: 20}), (:m {g: 'a', v: 30}), "
        "(:m {g: 'b', v: 5}), (:m {g: 'b', v: 15}), (:m {g: 'b', v: 100})"
    )
    return e


def test_explicit_group_by_having(engine):
    rows = engine.fetch(
        "MATCH (x:m) WITH x.g AS g, x.v AS v "
        "WITH g, count(*) AS n, sum(v) AS s GROUP BY g HAVING sum(v) > 100 "
        "RETURN g, n, s"
    )
    assert rows == [("b", 3, 120)]


def test_group_by_expression_over_key(engine):
    rows = engine.fetch(
        "MATCH (x:m) WITH x.g AS g, x.v AS v "
        "WITH g, g + '!' AS gx, sum(v) AS s GROUP BY g "
        "RETURN gx, s ORDER BY gx"
    )
    assert rows == [("a!", 60), ("b!", 120)]


def test_agg_filter_where(engine):
    rows = engine.fetch(
        "MATCH (x:m) RETURN count(*) AS n, "
        "count(*) FILTER (WHERE x.v > 12) AS big, "
        "sum(x.v) FILTER (WHERE x.g = 'a') AS sa"
    )
    assert rows == [(6, 4, 60)]


def test_within_group_percentiles(engine):
    rows = engine.fetch(
        "MATCH (x:m) WHERE x.g = 'a' "
        "RETURN percentile_cont(0.5) WITHIN GROUP (ORDER BY x.v) AS med, "
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY x.v) AS medd"
    )
    assert rows == [(20.0, 20.0)]


def test_window_rank_and_running(engine):
    rows = engine.fetch(
        "MATCH (x:m) WITH x.g AS g, x.v AS v "
        "WITH g, v, rank() OVER (PARTITION BY g ORDER BY v DESC) AS rk, "
        "     sum(v) OVER (PARTITION BY g ORDER BY v) AS run "
        "RETURN g, v, rk, run ORDER BY g, v"
    )
    assert rows == [
        ("a", 10, 3, 10), ("a", 20, 2, 30), ("a", 30, 1, 60),
        ("b", 5, 3, 5), ("b", 15, 2, 20), ("b", 100, 1, 120),
    ]


def test_named_window_and_lag(engine):
    rows = engine.fetch(
        "MATCH (x:m) WITH x.g AS g, x.v AS v "
        "WITH g, v, lag(v) OVER w AS prev, lead(v, 1, -1) OVER w AS nxt "
        "WINDOW w AS (PARTITION BY g ORDER BY v) "
        "RETURN g, v, prev, nxt ORDER BY g, v"
    )
    assert rows == [
        ("a", 10, None, 20), ("a", 20, 10, 30), ("a", 30, 20, -1),
        ("b", 5, None, 15), ("b", 15, 5, 100), ("b", 100, 15, -1),
    ]


def test_rows_frame(engine):
    rows = engine.fetch(
        "MATCH (x:m) WHERE x.g = 'a' WITH x.v AS v "
        "WITH v, sum(v) OVER (ORDER BY v ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s2 "
        "RETURN v, s2 ORDER BY v"
    )
    assert rows == [(10, 10), (20, 30), (30, 50)]


def test_with_where_on_own_alias(engine):
    """openCypher-style WHERE on the clause's own alias (deferred
    post-projection filter)."""
    rows = engine.fetch(
        "MATCH (x:m) WITH x.v * 2 AS dv WHERE dv > 50 RETURN dv ORDER BY dv"
    )
    assert rows == [(60,), (200,)]


def test_window_in_return(engine):
    rows = engine.fetch(
        "MATCH (x:m) WHERE x.g = 'b' "
        "RETURN x.v AS v, row_number() OVER (ORDER BY x.v DESC) AS rn ORDER BY v"
    )
    assert rows == [(5, 3), (15, 2), (100, 1)]
