"""Aggregation goldens mirrored from old/regress/aggregation.{sql,out}
(the UCSC students fixture): mixed float/numeric sums, null-ignoring
counts, cross-type min/max over gtype ORDERABILITY (a string zip sorts
below every numeric zip), the regr/corr family, and NULL-input
aggregates."""

import math

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH ucsc")
    e.execute("USE GRAPH ucsc")
    for stmt in [
        "CREATE (:students {name: 'Jack', gpa: 3.0, age: 21, zip: 94110})",
        "CREATE (:students {name: 'Jill', gpa: 3.5, age: 27, zip: 95060})",
        "CREATE (:students {name: 'Jim', gpa: 3.75, age: 32, zip: 96062})",
        "CREATE (:students {name: 'Rick', gpa: 2.5, age: 24, zip: '95060'})",
        "CREATE (:students {name: 'Ann', gpa: 3.8::numeric, age: 23})",
        "CREATE (:students {name: 'Derek', gpa: 4.0, age: 19, zip: 90210})",
        "CREATE (:students {name: 'Jessica', gpa: 3.9::numeric, age: 20})",
        "CREATE (:students {name: 'Dave', age: 24})",
        "CREATE (:students {name: 'Mike', age: 18})",
    ]:
        e.execute(stmt)
    return e


def one(engine, q):
    return engine.fetch(q)[0]


def test_corr(engine):
    got = one(engine, "MATCH (u) RETURN corr(u.gpa, u.age)")[0]
    assert math.isclose(got, -0.0611333038221933, rel_tol=1e-12)


def test_avg_sum_counts(engine):
    # aggregation.out: avg 3.49285714285714, sum 24.45, count 7, count(*) 9
    avg, s, ratio, cnt, star = one(
        engine,
        "MATCH (u) RETURN avg(u.gpa), sum(u.gpa), sum(u.gpa)/count(u.gpa), "
        "count(u.gpa), count(*)",
    )
    assert math.isclose(avg, 24.45 / 7, rel_tol=1e-12)
    assert math.isclose(s, 24.45, rel_tol=1e-12)
    assert math.isclose(ratio, 24.45 / 7, rel_tol=1e-12)
    assert (cnt, star) == (7, 9)


def test_min_max_gpa(engine):
    assert one(
        engine, "MATCH (u) RETURN min(u.gpa), max(u.gpa), count(u.gpa), count(*)"
    ) == (2.5, 4.0, 7, 9)


def test_min_max_names(engine):
    assert one(
        engine, "MATCH (u) RETURN min(u.name), max(u.name), count(u.name), count(*)"
    ) == ("Ann", "Rick", 9, 9)


def test_min_max_mixed_zip(engine):
    # zip is MIXED string/number: orderability puts every string below
    # every number, so min = '95060' (the string) and max = 96062
    assert one(
        engine, "MATCH (u) RETURN min(u.zip), max(u.zip), count(u.zip), count(*)"
    ) == ("95060", 96062, 5, 9)


def test_null_aggregates(engine):
    assert one(engine, "RETURN avg(NULL), sum(NULL), count(NULL)") == (None, None, 0)
    assert one(engine, "RETURN stdev(NULL), stdevp(NULL)") == (None, None)


def test_regr_family(engine):
    sxx, syy, sxy = one(
        engine, "MATCH (u) RETURN regr_sxx(u.gpa, u.age), regr_syy(u.gpa, u.age), "
        "regr_sxy(u.gpa, u.age)"
    )
    slope, icept, r2 = one(
        engine, "MATCH (u) RETURN regr_slope(u.gpa, u.age), "
        "regr_intercept(u.gpa, u.age), regr_r2(u.gpa, u.age)"
    )
    # internal consistency of the PG formulas over the fixture
    assert math.isclose(slope, sxy / sxx, rel_tol=1e-12)
    assert math.isclose(r2, (sxy * sxy) / (sxx * syy), rel_tol=1e-12)
    avgx, avgy = one(
        engine, "MATCH (u) RETURN regr_avgx(u.gpa, u.age), regr_avgy(u.gpa, u.age)"
    )
    assert math.isclose(icept, avgy - slope * avgx, rel_tol=1e-12)
