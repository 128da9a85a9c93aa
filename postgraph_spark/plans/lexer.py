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
    (?P<ws>\s+|//[^\n]*)
  | (?P<float>\d+\.(?!\.)\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>\d+)
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<name>[A-Za-z_][A-Za-z_0-9]*|`[^`]*`)
  | (?P<op><>|<=|>=|=~|\+=|\.\.|<->|->|<-|::|@-@|@@|@>|<@|\?\||\?&|!!=|!!|!~\*|!~|~\*|\|\||[-+*/%^=<>()\[\]{},.:|?&~])
    """,
    re.VERBOSE,
)


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
            body = val[1:-1]
            body = re.sub(r"\\(.)", lambda mm: {"n": "\n", "t": "\t", "r": "\r"}.get(mm.group(1), mm.group(1)), body)
            out.append(Token("string", body, m.start()))
        else:
            out.append(Token(kind, val, m.start()))
    out.append(Token("eof", "", n))
    return out
