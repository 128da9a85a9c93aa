"""Operator-spelling goldens (round-7 verdict #2/#3):

- regress/sql/vector.sql's operator section — `<->` l2, `<#>` negative
  inner product, `<=>` cosine distance over tovector() literals, with
  the expected values from regress/expected/vector.out verbatim.
- old/regress/network.sql:232-264 — the inet subnet operators
  `<< <<= >> >>= &&` including PG's abbreviated cidr literal form
  ('192.168.1/24'), truth values from old/regress/network.out verbatim
  (inet literals travel as strings here; the reference's bare-token
  inet literal syntax is a scanner difference, not an operator one).
- the `<->` runtime dispatch: tsquery operands still take the phrase
  path (vector.c:285-350 dispatches tsquery before vector).
"""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH vecnet")
    e.execute("USE GRAPH vecnet")
    return e


def val(engine, expr):
    return engine.fetch_values(f"RETURN {expr} AS r")[0]


# ------------------------------------------ vector.sql operator section

_A = "tovector('[1.0, 9, 2, .9]')"
_B = "tovector('[5.0, 2, 4, .324]')"


def test_vector_l2_operator(engine):
    assert val(engine, f"{_A} <-> {_A}") == 0.0
    assert abs(val(engine, f"{_B} <-> {_A}") - 8.32657048249758) < 1e-12
    assert val(engine, "tovector('[1.0]') <-> tovector('[2.0]')") == 1.0


def test_vector_nip_operator(engine):
    # inner([5,2,4,.324],[1,9,2,.9]) = 5+18+8+.2916 = 31.2916
    assert val(engine, f"{_A} <#> {_A}") == -(1.0 + 81.0 + 4.0 + 0.81)
    assert abs(val(engine, f"{_B} <#> {_A}") - (-31.2916)) < 1e-12
    assert val(engine, "tovector('[1.0]') <#> tovector('[2.0]')") == -2.0


def test_vector_cosine_operator(engine):
    assert val(engine, f"{_A} <=> {_A}") == 0.0
    assert abs(val(engine, f"{_B} <=> {_A}") - 0.499930158237086) < 1e-12
    assert val(engine, "tovector('[1.0]') <=> tovector('[2.0]')") == 0.0


def test_vector_phrase_dispatch_preserved(engine):
    # tsquery operands keep the phrase path (vector.c dispatch order)
    got = val(engine, "totsquery('a & b') <-> totsquery('c')")
    assert "<->" in got and "'c'" in got


# ---------------------------------- old/regress/network.sql:232-264

_NET_CASES = [
    # (expr, expected) — network.out verbatim
    ("'192.168.1.5' << '192.168.1/24'", True),
    ("'192.168.0.5' << '192.168.1/24'", False),
    ("'192.168.1/24' << '192.168.1/24'", False),
    ("'192.168.1.5' <<= '192.168.1/24'", True),
    ("'192.168.0.5' <<= '192.168.1/24'", False),
    ("'192.168.1/24' <<= '192.168.1/24'", True),
    ("'192.168.1.5' >> '192.168.1/24'", False),
    ("'192.168.0.5' >> '192.168.1/24'", False),
    ("'192.168.1/24' >> '192.168.1/24'", False),
    ("'192.168.1.5' >>= '192.168.1/24'", False),
    ("'192.168.0.5' >>= '192.168.1/24'", False),
    ("'192.168.1/24' >>= '192.168.1/24'", True),
    ("'192.168.1.5' && '192.168.1/24'", True),
    ("'192.168.0.5' && '192.168.1/24'", False),
    ("'192.168.1/24' && '192.168.1/24'", True),
    # reversed containment direction
    ("'192.168.1/24' >> '192.168.1.5'", True),
    ("'192.168.1/24' >>= '192.168.1.5'", True),
    # cross-family: false, not error (PG network_sub family check)
    ("'::1' << '192.168.1/24'", False),
    ("'::1/64' && '192.168.1/24'", False),
]


@pytest.mark.parametrize("expr,want", _NET_CASES)
def test_subnet_operators(engine, expr, want):
    assert val(engine, expr) is want


def test_subnet_null_and_garbage(engine):
    assert val(engine, "null << '192.168.1/24'") is None
    assert val(engine, "'not-an-ip' << '192.168.1/24'") is None
