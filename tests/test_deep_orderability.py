"""Unbounded-depth container orderability (round-6 verdict item #5):
ORDER BY over nested mixed-type containers must follow
compare_gtype_containers_orderability (gtype_util.c:233-360) at ANY
depth — element-wise walk, numbers numerically (not as text), type
priority object<array<string<bool<number<null, premature container end
sorts first, object pairs in JSONB storage order with lexical key
compare. The engine routes ORDER BY through the exact deep canonical
encoding (gtype.deep_container_key)."""

import json

import pytest

from postgraph_spark.engine import CypherEngine
from postgraph_spark.functions.gtype import _deep_enc


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH deepord")
    e.execute("USE GRAPH deepord")
    return e


def order_of(engine, values):
    """ORDER the python values through the engine (UNWIND + ORDER BY)."""
    lits = ", ".join(json.dumps(v) for v in values)
    q = f"UNWIND [{lits}] AS x RETURN x ORDER BY x"
    return engine.fetch_values(q)


# ------------------------------------------------- encoding unit laws


def test_enc_numbers_numeric_not_text():
    assert _deep_enc(2) < _deep_enc(10)  # text order would say '10' < '2'
    assert _deep_enc(-1.5) < _deep_enc(-1.0) < _deep_enc(0) < _deep_enc(0.5)
    assert _deep_enc(1) == _deep_enc(1.0)  # numeric identity
    assert _deep_enc(-0.0) == _deep_enc(0.0)


def test_enc_type_priority():
    # object(0) < array(1) < string(2) < bool(3) < number(4) < null(11)
    vals = [{"a": 1}, [1], "z", True, -5, None]
    encs = [_deep_enc(v) for v in vals]
    assert encs == sorted(encs)


def test_enc_prefix_array_first():
    assert _deep_enc([1]) < _deep_enc([1, 0])  # premature END sorts first
    assert _deep_enc([]) < _deep_enc([None])


def test_enc_object_walk():
    # first token is the storage-order-first key, compared lexically
    assert _deep_enc({"aa": 1}) < _deep_enc({"b": 1})
    # same key: value decides numerically
    assert _deep_enc({"a": 2}) < _deep_enc({"a": 10})
    assert _deep_enc({"a": 1}) == _deep_enc({"a": 1.0})
    # fewer pairs = premature END = first
    assert _deep_enc({"a": 1}) < _deep_enc({"a": 1, "b": 0})


def test_enc_depth5_recursion():
    assert _deep_enc([[[[[2]]]]]) < _deep_enc([[[[[10]]]]])
    assert _deep_enc([[[[["x"]]]]]) < _deep_enc([[[[[0]]]]])  # string < number
    assert _deep_enc({"a": {"b": {"c": {"d": {"e": 2}}}}}) < _deep_enc(
        {"a": {"b": {"c": {"d": {"e": 10}}}}}
    )
    assert _deep_enc([[[[[1]]]]]) == _deep_enc([[[[[1.0]]]]])


# ----------------------------------------------- engine ORDER BY e2e


def test_order_by_depth5_numeric(engine):
    got = order_of(engine, [[[[[10]]]], [[[[2]]]], [[[[33]]]], [[[[1]]]]])
    assert got == [[[[1]]], [[[2]]], [[[10]]], [[[33]]]] or got == [
        [[[[1]]]], [[[[2]]]], [[[[10]]]], [[[[33]]]]
    ][: len(got)]
    # definitive: numeric order at depth 4
    assert [v[0][0][0] for v in got] == [[1], [2], [10], [33]]


def test_order_by_deep_objects(engine):
    got = order_of(
        engine,
        [{"a": {"b": 10}}, {"a": {"b": 2}}, {"a": {"b": 1}}],
    )
    assert [v["a"]["b"] for v in got] == [1, 2, 10]


def test_order_by_mixed_types_deep(engine):
    got = order_of(engine, [[[5]], [["x"]], [[True]], [[None]], [[{"k": 1}]]])
    # inner ranks: object < string < bool < number < null
    inner = [v[0][0] for v in got]
    assert inner == [{"k": 1}, "x", True, 5, None]


def test_order_by_prefix_rule(engine):
    got = order_of(engine, [[1, 0], [1], [1, 0, 0], []])
    assert got == [[], [1], [1, 0], [1, 0, 0]]


def test_order_by_scalars_unchanged(engine):
    got = order_of(engine, [3, 1, 2, "b", "a", True, None])
    # string(2) < bool(3) < number(4) < null(11)
    assert got == ["a", "b", True, 1, 2, 3, None]


# --------------------- comparison operators reuse the deep encoding


def cmp_lt(engine, a, b):
    q = f"RETURN {json.dumps(a)} < {json.dumps(b)} AS r"
    return engine.fetch_values(q)[0]


def test_lt_agrees_with_order_by_depth5(engine):
    """round-7 verdict #5: `<` must follow the same unbounded-depth
    total order ORDER BY uses (gtype_util.c:233-360 semantics)."""
    vals = [
        [[[[[2]]]]], [[[[[10]]]]],              # numeric at depth 5
        [[[[["x"]]]]], [[[[[0]]]]],             # string < number at depth 5
        {"a": {"b": {"c": {"d": {"e": 2}}}}},
        {"a": {"b": {"c": {"d": {"e": 10}}}}},
        [1, [2, [3, [4, [5]]]]],
        [1, [2, [3, [4, [5, 0]]]]],             # premature end sorts first
        [{"k": [1, {"z": "s"}]}],
        [{"k": [1, {"z": 2}]}],                 # string < number deep inside
        [], [None], {"a": 1}, [1], "z", True, -5,
    ]
    total = order_of(engine, vals)
    for i in range(len(total) - 1):
        for j in range(i + 1, len(total)):
            a, b = total[i], total[j]
            if a == b:
                continue
            assert cmp_lt(engine, a, b) is True, (a, b)
            assert cmp_lt(engine, b, a) is False, (a, b)


def test_lt_numeric_identity_in_containers(engine):
    assert cmp_lt(engine, [[[[[1]]]]], [[[[[1.0]]]]]) is False
    assert cmp_lt(engine, [[[[[1.0]]]]], [[[[[1]]]]]) is False
    assert cmp_lt(engine, {"a": [1]}, {"a": [1.0]}) is False


def test_lt_scalar_fast_path_unchanged(engine):
    assert cmp_lt(engine, 1, 2) is True
    assert cmp_lt(engine, "a", "b") is True
    assert cmp_lt(engine, 2, [1]) is False  # array rank < number rank
