"""Property-based checks of the pure-Python canonicalization layers
(no Spark session needed): tsquery parse/render roundtrips, tsvector
canonical-form idempotence, multirange idempotence and merge soundness.
These are the layers whose text forms feed the JVM expression compilers,
so canonical-form stability is load-bearing for equality semantics."""

import random
import string

from hypothesis import given, settings, strategies as st

from postgraph_spark.functions import tsearch as TS
from postgraph_spark.functions.casts import multirange_in_py


# ------------------------------------------------------------- tsquery

_lex = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=6)


@st.composite
def tsquery_trees(draw, depth=3, allow_not=True):
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        lex = draw(_lex)
        prefix = draw(st.booleans())
        weights = draw(st.sampled_from(["", "A", "AB", "CD"]))
        return ("val", lex, weights, prefix)
    kind = draw(st.sampled_from(
        (["not"] if allow_not else []) + ["and", "or", "phrase"]
    ))
    if kind == "not":
        return ("not", draw(tsquery_trees(depth=depth - 1, allow_not=allow_not)))
    if kind == "phrase":
        # evaluator scope: NOT under phrase only as a direct single-side
        # operand (PG's own phrase executor has the same special case)
        left = draw(tsquery_trees(depth=depth - 1, allow_not=False))
        right = draw(tsquery_trees(depth=depth - 1, allow_not=False))
        side = draw(st.integers(0, 2))
        if side == 1:
            left = ("not", left)
        elif side == 2:
            right = ("not", right)
        return ("phrase", left, right, draw(st.integers(1, 9)))
    left = draw(tsquery_trees(depth=depth - 1, allow_not=allow_not))
    right = draw(tsquery_trees(depth=depth - 1, allow_not=allow_not))
    return (kind, left, right)


@given(tsquery_trees())
@settings(max_examples=300, deadline=None)
def test_tsquery_render_parse_semantics(tree):
    """render must preserve SEMANTICS through a parse roundtrip (the
    tree itself may re-associate: `a & (b & c)` renders to the flattened
    `a & b & c`, like PG's own output) — checked by evaluating both
    trees against a battery of random tsvectors."""
    rng = random.Random(11)
    back = TS.parse_tsquery(TS.render_tsquery(tree))
    lexes = sorted({v[0] for v in TS.query_lexemes(tree)})
    for _ in range(12):
        present = [lx for lx in lexes if rng.random() < 0.5]
        tsv = TS.render_tsvector(
            {lx: [(i + 1, "D")] for i, lx in enumerate(present)}
        ) or "'zzz'"
        assert TS.ts_match_py(tsv, tree) == TS.ts_match_py(tsv, back)


@given(tsquery_trees())
@settings(max_examples=200, deadline=None)
def test_tsquery_canonical_idempotent(tree):
    txt = TS.render_tsquery(tree)
    assert TS.tsquery_in(txt) == txt


# ------------------------------------------------------------ tsvector

@given(
    st.lists(
        st.tuples(_lex, st.lists(st.integers(1, 50), max_size=4)),
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_tsvector_canonical_idempotent(entries):
    txt = " ".join(
        lex + (":" + ",".join(map(str, ps)) if ps else "") for lex, ps in entries
    )
    c1 = TS.tsvector_in(txt)
    assert TS.tsvector_in(c1) == c1


def test_tsvector_match_consistency_fuzz():
    """ts_match_py over random docs/queries never raises and NOT is the
    complement on the same doc."""
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    for _ in range(200):
        doc = " ".join(rng.choice(words) for _ in range(rng.randint(0, 8)))
        tsv = TS.tsvector_in(doc) if doc else "'x'"
        w = rng.choice(words)
        q = TS.parse_tsquery(w)
        nq = TS.parse_tsquery("!" + w)
        assert TS.ts_match_py(tsv, q) != TS.ts_match_py(tsv, nq)


# ----------------------------------------------------------- multirange

_int_bound = st.integers(-20, 20)


@st.composite
def int_multiranges(draw):
    n = draw(st.integers(0, 4))
    members = []
    for _ in range(n):
        a = draw(_int_bound)
        b = draw(_int_bound)
        lo, hi = (a, b) if a <= b else (b, a)
        members.append(
            f"{draw(st.sampled_from('[('))}{lo},{hi}{draw(st.sampled_from('])'))}"
        )
    return "{" + ",".join(members) + "}"


@given(int_multiranges())
@settings(max_examples=300, deadline=None)
def test_int_multirange_canonical_idempotent(txt):
    c1 = multirange_in_py("int", txt)
    assert c1 is not None
    assert multirange_in_py("int", c1) == c1


@given(int_multiranges())
@settings(max_examples=300, deadline=None)
def test_int_multirange_membership_preserved(txt):
    """Every integer covered by the input members is covered by exactly
    the canonical (merged) members, and vice versa."""

    def covered(mr_txt):
        out = set()
        body = mr_txt.strip()[1:-1]
        if not body:
            return out
        import re

        for m in re.finditer(r"([\[\(])(-?\d*),(-?\d*)([\]\)])", body):
            lo = int(m.group(2)) + (0 if m.group(1) == "[" else 1)
            hi = int(m.group(3)) + (1 if m.group(4) == "]" else 0)
            out.update(range(lo, hi))
        return out

    canon = multirange_in_py("int", txt)
    assert covered(txt) == covered(canon)
