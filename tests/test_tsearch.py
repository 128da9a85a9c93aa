"""tsearch kit parity suite — every assertion mirrors a line of the
reference's regress/expected/tsearch.out (gtype_tsearch.c;
sql/postgraph-tsearch.sql.in). The two reference lines that ERROR in
its own regress run (strip(::tsvector), tsquery_phrase) are asserted
against their documented PG semantics instead."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture()
def eng(spark):
    return CypherEngine(spark)


def one(eng, q):
    return eng.fetch_values(q)[0]


# ------------------------------------------------------ totsvector cast

TSV_CASES = [
    ("RETURN totsvector('a fat cat sat on a mat and ate a fat rat')",
     "'a' 'and' 'ate' 'cat' 'fat' 'mat' 'on' 'rat' 'sat'"),
    ("RETURN totsvector('1')", "'1'"),
    ("RETURN totsvector('1 2')", "'1' '2'"),
    ("RETURN totsvector('\\'w\\':4A,3B,2C,1D,5 a:8')", "'a':8 'w':1,2C,3B,4A,5"),
]


def test_totsvector(eng):
    for q, want in TSV_CASES:
        assert one(eng, q) == want, q


def test_tsvector_comparisons(eng):
    # tsvector btree ops work on the canonical text (tsearch.out:58-130)
    assert one(eng, "RETURN totsvector('1') = totsvector('1')") is True
    assert one(eng, "RETURN totsvector('1') = totsvector('2')") is False
    assert one(eng, "RETURN totsvector('1') <> totsvector('2')") is True
    assert one(eng, "RETURN totsvector('1') < totsvector('2')") is True
    assert one(eng, "RETURN totsvector('2') < totsvector('1')") is False
    assert one(eng, "RETURN totsvector('1') <= totsvector('1')") is True
    assert one(eng, "RETURN totsvector('2') > totsvector('1')") is True
    assert one(eng, "RETURN totsvector('1') >= totsvector('2')") is False


def test_tsvector_concat(eng):
    assert one(eng, "RETURN totsvector('1') || totsvector('1')") == "'1'"
    assert one(eng, "RETURN totsvector('1') || totsvector('2')") == "'1' '2'"
    assert one(eng, "RETURN totsvector('2') || totsvector('1')") == "'1' '2'"


def test_ts_delete_and_strip(eng):
    assert one(
        eng,
        "RETURN ts_delete(totsvector('a fat cat sat on a mat and ate a fat rat'), 'rat')",
    ) == "'a' 'and' 'ate' 'cat' 'fat' 'mat' 'on' 'sat'"
    # reference line ERRORs in its own regress (node type 364); PG
    # semantics: positions/weights removed
    assert one(eng, "RETURN strip('fat:2,4 cat:3 rat:5A'::tsvector)") == "'cat' 'fat' 'rat'"


# ------------------------------------------------------- totsquery cast

TSQ_CASES = [
    ("1", "'1'"),
    ("'1 2'", "'1 2'"),
    ("!1", "!'1'"),
    ("1|2", "'1' | '2'"),
    ("!(!1|!2)", "!( !'1' | !'2' )"),
    ("!(!1|2)", "!( !'1' | '2' )"),
    ("!(1|2)", "!( '1' | '2' )"),
    ("!1&2", "!'1' & '2'"),
    ("1&!2", "'1' & !'2'"),
    ("!(1)&2", "!'1' & '2'"),
    ("!(1&2)", "!( '1' & '2' )"),
    ("1|!2&3", "'1' | !'2' & '3'"),
    ("!1|2&3", "!'1' | '2' & '3'"),
    ("(!1|2)&3", "( !'1' | '2' ) & '3'"),
    ("1|(2|(4|(5|6)))", "'1' | '2' | '4' | '5' | '6'"),
    ("1|2|4|5|6", "'1' | '2' | '4' | '5' | '6'"),
    ("1&(2&(4&(5|!6)))", "'1' & '2' & '4' & ( '5' | !'6' )"),
    ("a:* & nbb:*ac | doo:a* | goo", "'a':* & 'nbb':*AC | 'doo':*A | 'goo'"),
    ("!!!b", "!!!'b'"),
    ("!!a & b", "!!'a' & 'b'"),
]


def test_totsquery(eng):
    for raw, want in TSQ_CASES:
        src = raw.replace("'", "\\'")
        assert one(eng, f"RETURN totsquery('{src}')") == want, raw


# ------------------------------------------- to-tsquery parser family

def test_plainto_tsquery(eng):
    assert one(eng, "RETURN plainto_tsquery('\"fat rat\" or cat dog')") == \
        "'fat' & 'rat' & 'cat' & 'dog'"
    assert one(eng, "RETURN plainto_tsquery('The Fat Rats')") == "'fat' & 'rat'"
    assert one(eng, "RETURN plainto_tsquery('The Cat and Rats')") == "'cat' & 'rat'"


def test_phraseto_tsquery(eng):
    assert one(eng, "RETURN phraseto_tsquery('The Fat Rats')") == "'fat' <-> 'rat'"
    assert one(eng, "RETURN phraseto_tsquery('The Cat and Rats')") == "'cat' <2> 'rat'"


def test_websearch_to_tsquery(eng):
    assert one(eng, "RETURN websearch_to_tsquery('\"fat rat\" or cat dog')") == \
        "'fat' <-> 'rat' | 'cat' & 'dog'"
    assert one(eng, "RETURN websearch_to_tsquery('The Fat Rats')") == "'fat' & 'rat'"
    assert one(eng, "RETURN websearch_to_tsquery('The Cat and Rats')") == "'cat' & 'rat'"


# ------------------------------------------------------ tsquery operators

def test_tsquery_comparisons(eng):
    assert one(eng, "RETURN totsquery('1') = totsquery('1')") is True
    assert one(eng, "RETURN totsquery('1') = totsquery('2')") is False
    assert one(eng, "RETURN totsquery('1') <> totsquery('2')") is True
    assert one(eng, "RETURN totsquery('1') < totsquery('2')") is True
    assert one(eng, "RETURN totsquery('2') <= totsquery('1')") is False
    assert one(eng, "RETURN totsquery('2') > totsquery('1')") is True
    assert one(eng, "RETURN totsquery('1') >= totsquery('2')") is False


def test_tsquery_and_or(eng):
    assert one(eng, "RETURN '1'::tsquery & '2'::tsquery") == "'1' & '2'"
    assert one(eng, "RETURN '2'::tsquery & '1'::tsquery") == "'2' & '1'"
    assert one(eng, "RETURN '1'::tsquery || '2'::tsquery") == "'1' | '2'"
    assert one(eng, "RETURN '2'::tsquery || '1'::tsquery") == "'2' | '1'"


def test_tsquery_phrase_ops(eng):
    assert one(eng, "RETURN tsquery_phrase('fat'::tsquery, 'cat'::tsquery)") == \
        "'fat' <-> 'cat'"
    assert one(eng, "RETURN 'fat'::tsquery <-> 'cat'::tsquery") == "'fat' <-> 'cat'"
    assert one(eng, "RETURN tsquery_phrase('fat'::tsquery, 'cat'::tsquery, 10)") == \
        "'fat' <10> 'cat'"


def test_tsquery_containment(eng):
    assert one(eng, "RETURN 'cat & rat'::tsquery @> 'rat'::tsquery") is True
    assert one(eng, "RETURN 'cat'::tsquery @> 'cat & rat'::tsquery") is False
    assert one(eng, "RETURN 'cat & rat'::tsquery <@ 'rat'::tsquery") is False
    assert one(eng, "RETURN 'cat'::tsquery <@ 'cat & rat'::tsquery") is True


def test_tsquery_not_not(eng):
    assert one(eng, "RETURN !! totsquery('!1|2&3')") == "!( !'1' | '2' & '3' )"


# ------------------------------------------------------------ @@ match

def test_match_boolean(eng):
    doc = "totsvector('a fat cat sat on a mat')"
    assert one(eng, f"RETURN {doc} @@ totsquery('fat & cat')") is True
    assert one(eng, f"RETURN {doc} @@ totsquery('fat & dog')") is False
    assert one(eng, f"RETURN {doc} @@ totsquery('fat & !dog')") is True
    assert one(eng, f"RETURN {doc} @@ totsquery('dog | mat')") is True
    # query on the left (PG supports both orders)
    assert one(eng, f"RETURN totsquery('fat') @@ {doc}") is True


def test_match_phrase_positions(eng):
    doc = "totsvector('fat:1 cat:2 rat:3')"
    assert one(eng, f"RETURN {doc} @@ totsquery('fat <-> cat')") is True
    assert one(eng, f"RETURN {doc} @@ totsquery('cat <-> fat')") is False
    assert one(eng, f"RETURN {doc} @@ totsquery('fat <2> rat')") is True
    assert one(eng, f"RETURN {doc} @@ totsquery('fat <-> rat')") is False
    assert one(eng, f"RETURN {doc} @@ phraseto_tsquery('fat cat')") is True


def test_match_phrase_negated(eng):
    """Negated phrase operands (TS_phrase_execute's NOT special case):
    `!a <-> b` matches b wherever a is NOT immediately before."""
    doc = "totsvector('fat:1 cat:2 rat:3')"
    assert one(eng, f"RETURN {doc} @@ totsquery('!dog <-> cat')") is True
    assert one(eng, f"RETURN {doc} @@ totsquery('!fat <-> cat')") is False
    assert one(eng, f"RETURN {doc} @@ totsquery('fat <-> !rat')") is True
    assert one(eng, f"RETURN {doc} @@ totsquery('cat <-> !rat')") is False


def test_match_prefix(eng):
    doc = "totsvector('catalog fattening')"
    assert one(eng, f"RETURN {doc} @@ totsquery('cat:*')") is True
    assert one(eng, f"RETURN {doc} @@ totsquery('cat')") is False


def test_match_websearch(eng):
    # stemmed websearch query against a stemmed document vector
    doc = "to_tsvector('The fat rats sat on the cats')"
    assert one(eng, f"RETURN {doc} @@ websearch_to_tsquery('\"fat rat\"')") is True
    assert one(eng, f"RETURN {doc} @@ websearch_to_tsquery('rat -dog')") is True
    assert one(eng, f"RETURN {doc} @@ websearch_to_tsquery('rat -cat')") is False


def test_plain_string_concat_still_works(eng):
    assert one(eng, "RETURN 'foo' || 'bar'") == "foobar"
    assert one(eng, "RETURN [1, 2] || [3]") == [1, 2, 3]
    # integer & stays bitwise
    assert one(eng, "RETURN 6 & 3") == 2
    assert one(eng, "RETURN 6 | 3") == 7


# ---------------------------------------- @@ with a COLUMN-valued query
#
# ast_ts_literal can't see a runtime variable, so these exercise the
# rpn_match JVM fold (boolean/prefix/phrase/weighted queries — the
# whole supported surface since round 10) and the masked Arrow
# fallback (malformed queries and the PG-error phrase forms).

COLUMN_QUERY_MATRIX = [
    "fat & cat", "fat & dog", "fat & !dog", "dog | mat", "cat:*",
    "(fat | dog) & !cow", "!(fat & dog)", "f:*", "zzz:*",
    "fat <-> cat", "cat <-> fat", "fat <2> rat", "!fat <-> cat",
    "fat:A", "fat:AB | cat",
]


def test_match_column_query_agrees_with_python_eval(eng):
    from postgraph_spark.functions.tsearch import (
        parse_tsquery, ts_match_py, tsquery_in, tsvector_in,
    )

    doc_text = "fat:1,11 cat:2 rat:3 mat:7A"
    doc = f"totsvector('{doc_text}')"
    tsv = tsvector_in(doc_text)
    arr = ", ".join(f"'{q}'" for q in COLUMN_QUERY_MATRIX)
    cols = eng.fetch(
        f"UNWIND [{arr}] AS s RETURN s, {doc} @@ totsquery(s) AS m"
    )
    got = {s: m for s, m in cols}
    for q in COLUMN_QUERY_MATRIX:
        want = ts_match_py(tsv, parse_tsquery(tsquery_in(q)))
        assert got[q] == want, (q, got[q], want)
    # the JVM fold and the literal compile path agree on EVERY query —
    # including weighted terms (both sides filter the weighted entry
    # map exactly since round 10)
    for q in COLUMN_QUERY_MATRIX:
        lit = one(eng, f"RETURN {doc} @@ totsquery('{q}')")
        assert got[q] == lit, (q, got[q], lit)
    # both match orders and a malformed query (null, not an error)
    assert eng.fetch_values(
        f"UNWIND ['fat'] AS s RETURN totsquery(s) @@ {doc}"
    ) == [True]
    assert eng.fetch_values(
        f"UNWIND ['bad ( query'] AS s RETURN {doc} @@ totsquery(s)"
    ) == [None]


def test_tsquery_rpn_tokens():
    from postgraph_spark.functions.tsearch import tsquery_in, tsquery_rpn

    assert tsquery_rpn(tsquery_in("fat & !dog")) == ["v:0:fat", "v:0:dog", "!", "&"]
    assert tsquery_rpn(tsquery_in("a | b & c:*")) == [
        "v:0:a", "v:0:b", "p:0:c", "&", "|",
    ]
    # phrase distance and weight restrictions are JVM tokens now
    assert tsquery_rpn(tsquery_in("a <-> b")) == ["v:0:a", "v:0:b", "d:1"]
    assert tsquery_rpn(tsquery_in("a <3> b")) == ["v:0:a", "v:0:b", "d:3"]
    assert tsquery_rpn(tsquery_in("!a <-> b")) == ["v:0:a", "v:0:b", "l:1"]
    assert tsquery_rpn(tsquery_in("a <-> !b")) == ["v:0:a", "v:0:b", "r:1"]
    assert tsquery_rpn(tsquery_in("a:A")) == ["v:8:a"]
    assert tsquery_rpn(tsquery_in("a:AB | b:*D")) == ["v:c:a", "p:1:b", "|"]
    # the two forms PG itself errors on still route to the fallback
    assert tsquery_rpn(tsquery_in("!a <-> !b")) == ["X"]
    assert tsquery_rpn(tsquery_in("(!a & b) <-> c")) == ["X"]
