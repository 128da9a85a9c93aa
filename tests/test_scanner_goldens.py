"""Scanner goldens mirrored from old/regress/scan.{sql,out}: comments,
octal / hex integer literals (with the beyond-int64 -> float overflow
rule), decimal and scientific forms, and string escape sequences
including \\uXXXX surrogate pairing."""

import pytest

from postgraph_spark.engine import CypherEngine
from postgraph_spark.plans.lexer import LexError, tokenize


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH scan")
    e.execute("USE GRAPH scan")
    return e


def vals(engine, expr):
    return engine.fetch(f"RETURN {expr}")[0]


def test_comments(engine):
    assert vals(engine, "0 /* multi-line\ncomment */ + 1") == (1,)
    assert vals(engine, "0 // rest is comment\n + 2") == (2,)
    assert vals(engine, "0 /**/ + 3") == (3,)


def test_octal_integers(engine):
    # scan.out: 010 = 8, 077 = 63, 2^31 boundaries, 2^60-1
    assert vals(engine, "00, 010, 077, 017777777777, 0020000000000") == (
        0, 8, 63, 2147483647, 2147483648,
    )
    assert vals(engine, "077777777777777777777") == (1152921504606846975,)
    # 2^64-1 overflows int64 -> float (scan.out: 1.84467440737096e+19)
    (v,) = vals(engine, "01777777777777777777777")
    assert isinstance(v, float) and v == float(2**64 - 1)


def test_octal_invalid_digit():
    with pytest.raises(LexError, match="octal"):
        tokenize("RETURN 012345678")
    with pytest.raises(LexError, match="octal"):
        tokenize("RETURN 09")


def test_hex_integers(engine):
    assert vals(engine, "0x0, 0xA, 0XFf, 0x7FFFFFFF, 0x080000000") == (
        0, 10, 255, 2147483647, 2147483648,
    )
    assert vals(engine, "0xde0b6b3a7640000") == (10**18,)
    (v,) = vals(engine, "0xffffffffffffffff")
    assert isinstance(v, float) and v == float(2**64 - 1)


def test_decimal_and_scientific(engine):
    assert vals(engine, "03., 3.141592, .141592") == (3.0, 3.141592, 0.141592)
    assert vals(engine, "3141592e-6, 3.141592E0, .3141592e+1") == (
        3.141592, 3.141592, 3.141592,
    )


def test_string_escapes(engine):
    expr = '" \\" \' \\\' ", " / \\/ \\\\ \\b \\f \\n \\r \\t "'
    got = vals(engine, expr)
    assert got[0] == " \" ' ' "
    assert got[1] == " / / \\ \b \f \n \r \t "


def test_unicode_escapes(engine):
    assert vals(engine, r'"Ω"') == ("Ω",)  # GREEK CAPITAL OMEGA
    # surrogate pair -> one astral codepoint
    assert vals(engine, r'"𝔄"') == ("\U0001d504",)


def test_invalid_unicode_escapes():
    with pytest.raises(LexError):
        tokenize(r'RETURN "\uD835"')  # lone high surrogate
    with pytest.raises(LexError):
        tokenize(r'RETURN "\uD835."')  # high + non-low
    with pytest.raises(LexError):
        tokenize(r'RETURN "\uDEF0"')  # lone low surrogate
    with pytest.raises(LexError):
        tokenize(r'RETURN "\u00G0"')  # bad hex
