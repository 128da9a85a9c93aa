"""`@>` deep containment as a JVM variant walk (round-6): the Arrow-UDF
escape hatch is gone. The pure-Python `_jsonb_contains` stays as the
executable spec — these tests check the JVM expression against it on
goldens mirroring gtype_ops.c:849-1080 / PG jsonb semantics, then on a
randomized document battery."""

import json
import random

import pytest
from pyspark.sql import functions as F

from postgraph_spark.engine import CypherEngine
from postgraph_spark.functions import gtype as G


@pytest.fixture()
def eng(spark):
    return CypherEngine(spark)


GOLDENS = [
    # scalars / top-level array-of-scalar
    ('{"a": 1}', '{"a": 1}', True),
    ('{"a": 1}', '{"a": 2}', False),
    ('{"a": 1, "b": 2}', '{"a": 1}', True),
    ('{"a": 1}', '{"a": 1, "b": 2}', False),
    ('[1, 2, 3]', '[1, 3]', True),
    ('[1, 2, 3]', '[4]', False),
    ('[1, 2, 3]', '3', True),  # top-level array contains scalar
    ('[1, 2, 3]', '5', False),
    ('{"a": 1}', '1', False),  # scalar vs object: no
    ('"x"', '"x"', True),
    ('1', '1.0', True),  # numeric cross-type
    ('"1"', '1', False),  # string never equals number
    # nested objects (the round-5 gap: deep recursion)
    ('{"a": {"b": {"c": 1, "d": 2}}}', '{"a": {"b": {"c": 1}}}', True),
    ('{"a": {"b": {"c": 1}}}', '{"a": {"b": {"d": 1}}}', False),
    ('{"a": [1, {"x": "y", "z": 0}]}', '{"a": [{"x": "y"}]}', True),
    ('{"a": [1, {"x": "y"}]}', '{"a": [{"x": "n"}]}', False),
    ('[[1, 2], [3, 4]]', '[[1]]', True),  # array-of-array element containment
    ('[[1, 2], [3, 4]]', '[[5]]', False),
    ('{"tags": ["a", "b"], "k": {"n": null}}', '{"k": {"n": null}}', True),
    ('{"a": []}', '{"a": []}', True),
    ('{"a": [1]}', '{"a": []}', True),  # empty array contained in any array
    ('{}', '{}', True),
    ('{"a": 1}', '{}', True),
]


def test_containment_goldens(spark):
    df = spark.createDataFrame([(a, b) for a, b, _ in GOLDENS], ["a", "b"])
    got = df.select(
        G.op_contains_json(
            G.gv_variantish(F.col("a")) if hasattr(G, "gv_variantish") else _gv(F.col("a")),
            _gv(F.col("b")),
        )["b"].alias("r")
    ).collect()
    for (a, b, want), row in zip(GOLDENS, got):
        assert row["r"] == want, f"{a} @> {b}"
    # python spec agrees
    for a, b, want in GOLDENS:
        assert G._jsonb_contains(json.loads(a), json.loads(b), top=True) == want, (a, b)


def _gv(c):
    """json text column -> gval with the container/scalar routed like
    the engine does (containers into j, scalars decoded)."""
    t = F.trim(c)
    is_container = t.startswith("{") | t.startswith("[")
    return G._mk(
        F.when(is_container, F.when(t.startswith("{"), G.T_OBJECT).otherwise(G.T_ARRAY))
        .otherwise(
            F.when(t.startswith('"'), F.lit(G.T_STRING))
            .when(t.isin("true", "false"), F.lit(G.T_BOOL))
            .when(t == "null", F.lit(G.T_NULL))
            .otherwise(F.lit(G.T_NUMBER))
        ),
        b=F.when(t == "true", F.lit(True)).when(t == "false", F.lit(False)),
        i=t.try_cast("long"),
        d=t.try_cast("double"),
        s=F.when(t.startswith('"'), F.regexp_replace(t, r'^"|"$', "")),
        j=F.when(is_container, t),
    )


def _rand_doc(depth=3):
    r = random.random()
    if depth == 0 or r < 0.35:
        return random.choice([1, 2, 2.0, "a", "b", True, None, 9007199254740993])
    if r < 0.7:
        return {
            k: _rand_doc(depth - 1)
            for k in random.sample(["a", "b", "c", "d"], random.randint(0, 3))
        }
    return [_rand_doc(depth - 1) for _ in range(random.randint(0, 3))]


def test_containment_random_vs_spec(spark):
    random.seed(42)
    pairs = []
    for _ in range(120):
        a = _rand_doc()
        # half the time derive b FROM a so containment is often true
        if random.random() < 0.5 and isinstance(a, (dict, list)) and a:
            if isinstance(a, dict):
                b = {k: a[k] for k in random.sample(list(a), random.randint(1, len(a)))}
            else:
                b = random.sample(a, random.randint(1, len(a)))
        else:
            b = _rand_doc(2)
        pairs.append((json.dumps(a), json.dumps(b)))
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = df.select(G.op_contains_json(_gv(F.col("a")), _gv(F.col("b")))["b"].alias("r")).collect()
    for (a, b), row in zip(pairs, got):
        if a == "null" or b == "null":
            # a TOP-LEVEL json null decodes to gtype null -> 3VL null
            want = None
        else:
            want = G._jsonb_contains(json.loads(a), json.loads(b), top=True)
        assert row["r"] == want, f"{a} @> {b}: jvm={row['r']} spec={want}"


def test_cypher_nested_containment(eng):
    assert eng.fetch_values(
        "RETURN {a: {b: {c: 1, d: 2}}} @> {a: {b: {c: 1}}}"
    ) == [True]
    assert eng.fetch_values(
        "RETURN {a: {b: {c: 1}}} @> {a: {b: {c: 2}}}"
    ) == [False]
    assert eng.fetch_values("RETURN [[1, 2], [3]] @> [[2]]") == [True]
    assert eng.fetch_values("RETURN [1, 2, 3] @> 2") == [True]
    assert eng.fetch_values("RETURN {a: [1, {x: 'y'}]} <@ {a: [1, {x: 'y'}], b: 0}") == [True]


def test_deep_needle_containment_exact(spark):
    """Needles nested deeper than the JVM unroll route through the
    exact recursive check (round-6 verdict item #5): numeric identity
    and subset semantics must hold at depth 5+, where the old
    text-equality leaf under-approximated."""
    from postgraph_spark.engine import CypherEngine

    e = CypherEngine(spark)
    e.execute("CREATE GRAPH deepcont")
    e.execute("USE GRAPH deepcont")

    def check(q, want):
        assert e.fetch_values(f"RETURN {q}") == [want], q

    # depth-5 needle, numeric form differs -> still contained
    check(
        "{a: {b: {c: {d: {e: 1, f: 2}}}}} @> {a: {b: {c: {d: {e: 1.0}}}}}",
        True,
    )
    # depth-5 subset (extra keys in the haystack's deep object)
    check(
        "{a: {b: {c: {d: {e: 1, f: 2}}}}} @> {a: {b: {c: {d: {f: 2}}}}}",
        True,
    )
    check(
        "{a: {b: {c: {d: {e: 1}}}}} @> {a: {b: {c: {d: {e: 2}}}}}",
        False,
    )
    # deep arrays: element containment, order-free
    check("[[[[[1, 2, 3]]]]] @> [[[[[3, 1]]]]]", True)
    check("[[[[[1, 2]]]]] @> [[[[[4]]]]]", False)
    # <@ flips operands (needle = left)
    check("{a: {b: {c: {d: {e: 1.0}}}}} <@ {a: {b: {c: {d: {e: 1, x: 9}}}}}", True)
    # bool never equals number, even deep
    check("{a: {b: {c: {d: {e: true}}}}} @> {a: {b: {c: {d: {e: 1}}}}}", False)


def test_deep_python_contains_unit():
    from postgraph_spark.functions.gtype import _py_deep_contains, json_value_depth

    assert json_value_depth({"a": [{"b": 1}]}) == 3
    assert json_value_depth(5) == 0
    assert _py_deep_contains({"a": [1, 2]}, {"a": [2]})
    assert not _py_deep_contains({"a": [1, 2]}, {"a": [3]})
    assert _py_deep_contains([1, 2], 2, top=True)  # top-level scalar in array
    assert not _py_deep_contains([1, 2], 2)  # non-top: array vs scalar
    assert not _py_deep_contains({"a": True}, {"a": 1})
