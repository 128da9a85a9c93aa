"""Exact numeric identity through tonumeric / `::numeric`
(gtype_tonumeric, gtype.c:2319-2360): integral values keep their int64
identity so arithmetic and sums stay exact past 2^53 — the float8-only
mapping was a documented round-5 divergence, now closed for integers."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture()
def eng(spark):
    return CypherEngine(spark)


def test_tonumeric_exact_past_2_53(eng):
    # 2^53 + 1: float8 cannot represent it; the int identity can
    assert eng.fetch_values("RETURN tonumeric('9007199254740993') + 1") == [
        9007199254740994
    ]
    assert eng.fetch_values("RETURN '9007199254740993'::numeric") == [9007199254740993]
    assert eng.fetch_values("RETURN tonumeric(9007199254740993) * 2") == [
        18014398509481986
    ]


def test_tonumeric_fractional_and_bad(eng):
    assert eng.fetch_values("RETURN tonumeric('2.5')") == [2.5]
    assert eng.fetch_values("RETURN tonumeric('not a number')") == [None]
    assert eng.fetch_values("RETURN tonumeric(2.5) + 1") == [3.5]


def test_sum_exact_on_big_ints(eng):
    rows = eng.fetch_values(
        "UNWIND [9007199254740993, 1, 1] AS x RETURN sum(tonumeric(x))"
    )
    assert rows == [9007199254740995]
