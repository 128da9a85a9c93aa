"""Cypher tokenizer (the analog of the reference's flex scanner,
src/backend/parser/ag_scanner.l). Keywords are case-insensitive;
identifiers keep their case; backtick-quoted identifiers supported.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "match", "optional", "where", "return", "with", "unwind", "as", "create",
    "merge", "set", "remove", "delete", "detach", "order", "by", "asc",
    "ascending", "desc", "descending", "skip", "limit", "distinct", "and",
    "or", "xor", "not", "in", "starts", "ends", "contains", "is", "null",
    "true", "false", "case", "when", "then", "else", "end", "union", "all",
    "intersect", "except", "exists", "nulls", "first", "last", "having",
    "like", "ilike",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*(?:[^*]|\*(?!/))*\*/)
  | (?P<float>\d+\.(?!\.)\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<hex>0[xX][0-9A-Fa-f]+)
  | (?P<octal>0[0-9]+)
  | (?P<int>\d+)
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<name>[A-Za-z_][A-Za-z_0-9]*|`[^`]*`)
  | (?P<op><=>|<\#>|<>|<<=|<<|<=|>=|>>=|>>|=~|\+=|\.\.|<->|->|<-|::|@-@|@@|@>|<@|\?\||\?&|!!=|!!|!~\*|!~|~\*|\|\||&&|[-+*/%^=<>()\[\]{},.:|?&~\#])
    """,
    re.VERBOSE,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}


def _decode_string(body: str, pos: int) -> str:
    """Escape decoding matching the reference scanner (ag_scanner.l
    string rules; old/regress/scan.sql): the control escapes, quote /
    slash / backslash literals, \\uXXXX with surrogate pairing (a lone
    or mismatched surrogate is an error), anything else passes the
    escaped char through."""
    out = []
    i = 0
    n = len(body)
    while i < n:
        ch = body[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        nxt = body[i + 1] if i + 1 < n else ""
        if nxt == "u":
            hexs = body[i + 2 : i + 6]
            if len(hexs) < 4 or any(c not in "0123456789abcdefABCDEF" for c in hexs):
                raise LexError(f"invalid Unicode escape at {pos + i}")
            cp = int(hexs, 16)
            i += 6
            if 0xD800 <= cp <= 0xDBFF:  # high surrogate: need the low half
                if body[i : i + 2] != "\\u":
                    raise LexError(f"unterminated surrogate pair at {pos + i}")
                lows = body[i + 2 : i + 6]
                if len(lows) < 4:
                    raise LexError(f"invalid Unicode escape at {pos + i}")
                low = int(lows, 16)
                if not 0xDC00 <= low <= 0xDFFF:
                    raise LexError(f"invalid surrogate pair at {pos + i}")
                cp = 0x10000 + ((cp - 0xD800) << 10) + (low - 0xDC00)
                i += 6
            elif 0xDC00 <= cp <= 0xDFFF:
                raise LexError(f"unexpected low surrogate at {pos + i}")
            out.append(chr(cp))
            continue
        out.append(_ESCAPES.get(nxt, nxt))
        i += 2
    return "".join(out)


@dataclass
class Token:
    kind: str  # 'kw' | 'name' | 'int' | 'float' | 'string' | 'op' | 'eof'
    value: str
    pos: int


class LexError(ValueError):
    pass


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise LexError(f"unexpected character {text[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group()
        if kind == "ws":
            continue
        if kind == "name":
            if val.startswith("`"):
                out.append(Token("name", val[1:-1], m.start()))
            elif val.lower() in KEYWORDS:
                out.append(Token("kw", val.lower(), m.start()))
            else:
                out.append(Token("name", val, m.start()))
        elif kind == "string":
            out.append(Token("string", _decode_string(val[1:-1], m.start()), m.start()))
        elif kind == "hex":
            # hex literal; beyond int64 it becomes a float, exactly the
            # reference scanner's overflow rule (0xffffffffffffffff ->
            # 1.84467440737096e+19, old/regress/scan.out)
            v = int(val, 16)
            if v > 0x7FFFFFFFFFFFFFFF:
                out.append(Token("float", repr(float(v)), m.start()))
            else:
                out.append(Token("int", str(v), m.start()))
        elif kind == "octal":
            if any(c in "89" for c in val):
                raise LexError(f"invalid octal digit in {val!r} at {m.start()}")
            v = int(val, 8)
            if v > 0x7FFFFFFFFFFFFFFF:
                out.append(Token("float", repr(float(v)), m.start()))
            else:
                out.append(Token("int", str(v), m.start()))
        else:
            out.append(Token(kind, val, m.start()))
    out.append(Token("eof", "", n))
    return out
