"""Regex operator goldens mirrored from old/regress/regex.{sql,out}:
`=~` (anchored full match), `~`/`~*` (POSIX match-anywhere, case
sensitive/insensitive), `!~`/`!~*` (negations), including inline (?i)
flags passing through to the engine regex."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH regex")
    e.execute("USE GRAPH regex")
    e.execute("CREATE (n:Person {name: 'John'})")
    e.execute("CREATE (n:Person {name: 'Jeff'})")
    e.execute("CREATE (n:Person {name: 'Joan'})")
    return e


def names(engine, op, pat):
    rows = engine.fetch_values(
        f"MATCH (n:Person) WHERE n.name {op} '{pat}' RETURN n.name"
    )
    return sorted(rows)


# (operator, pattern) -> matching names; counts from regex.out
GOLDENS = [
    ("=~", "JoHn", []),
    ("=~", "(?i)JoHn", ["John"]),
    ("=~", "Jo.n", ["Joan", "John"]),
    ("=~", "J.*", ["Jeff", "Joan", "John"]),
    ("~", "JoHn", []),
    ("~", "(?i)JoHn", ["John"]),
    ("~", "Jo.n", ["Joan", "John"]),
    ("~", "J.*", ["Jeff", "Joan", "John"]),
    ("~*", "john", ["John"]),
    ("~*", "(?i)john", ["John"]),
    ("~*", "jo.n", ["Joan", "John"]),
    ("~*", "j.*", ["Jeff", "Joan", "John"]),
    ("~*", ".*", ["Jeff", "Joan", "John"]),
    ("~*", "JOHN", ["John"]),
    ("!~", "john", ["Jeff", "Joan", "John"]),
    ("!~", "(?i)john", ["Jeff", "Joan"]),
    ("!~", "Jo.n", ["Jeff"]),
    ("!~", "J.*", []),
    ("!~", ".*", []),
    ("!~", "JOHN", ["Jeff", "Joan", "John"]),
    ("!~*", "john", ["Jeff", "Joan"]),
    ("!~*", "jo.n", ["Jeff"]),
    ("!~*", "JOHN", ["Jeff", "Joan"]),
]


@pytest.mark.parametrize("op,pat,want", GOLDENS)
def test_regex_golden(engine, op, pat, want):
    assert names(engine, op, pat) == want


def test_anchored_vs_anywhere(engine):
    # `=~` is a FULL match; `~` matches anywhere (gtype_string.c:193-227)
    assert names(engine, "=~", "oh") == []
    assert names(engine, "~", "oh") == ["John"]
