"""Text-search kit: tsvector/tsquery parsing, canonical rendering,
query-tree match, and the to-tsquery parser family.

Reference surface: gtype_tsearch.c (9 fns: tsquery_or/not, ts_delete,
ts_strip, tsquery_phrase[_distance], plainto/phraseto/websearch_to_
tsquery), the totsvector/totsquery casts (gtype_typecasting.c), and the
operators exercised by regress/sql/tsearch.sql (`@@`, `&`, `||`, `!!`,
`<->`, `@>`, `<@`, comparisons).

Representation: both types are canonical PG TEXT inside a string gval,
with a subtype marker ('tsv' / 'tsq') carried in the gval's otherwise
unused `j` slot — decode/equality/ordering see a plain string (matching
the reference's display forms), while `||`/`&` can dispatch tsquery-OR
vs tsvector-concat exactly like gtype_tsquery_or does on its type tag.

Execution model: query strings are almost always LITERALS, so the
tsquery is parsed ONCE on the driver and `tsv @@ tsq` compiles to pure
JVM expressions (map lookup + boolean/positional algebra) that run
inside whole-stage codegen — no Python in the scan loop. Non-literal
queries fall back to an Arrow-batched pandas UDF. The to-tsquery parsers
(stemming + stopwords) are inherently scalar text work and run as
pandas UDFs (or fold at compile time for literal arguments).
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgraph_spark.functions import gtype as G

# --------------------------------------------------------------- stopwords
#
# The standard english snowball stopword list (public; the same list
# PostgreSQL ships as english.stop).

STOPWORDS = frozenset(
    """i me my myself we our ours ourselves you your yours yourself
    yourselves he him his himself she her hers herself it its itself they
    them their theirs themselves what which who whom this that these those
    am is are was were be been being have has had having do does did doing
    a an the and but if or because as until while of at by for with about
    against between into through during before after above below to from
    up down in out on off over under again further then once here there
    when where why how all any both each few more most other some such no
    nor not only own same so than too very s t can will just don should
    now""".split()
)


# ------------------------------------------------------- porter stemmer
#
# Porter (1980), "An algorithm for suffix stripping" — the published
# public-domain algorithm; close to the Snowball english stemmer the
# reference inherits from PG's default text search config.

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    m, prev_v = 0, False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if not v and prev_v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    if not (_is_cons(w, -3 + len(w)) is True):
        pass
    i = len(w) - 1
    return (
        _is_cons(w, i)
        and w[i] not in "wxy"
        and not _is_cons(w, i - 1)
        and _is_cons(w, i - 2)
    )


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def porter_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        w = _step1b_fix(w)
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        w = _step1b_fix(w)
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
        ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
        ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 1:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and _measure(w[:-3]) > 1 and w[-4:-3] in ("s", "t"):
            w = w[:-3]
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        if _measure(stem) > 1 or (_measure(stem) == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def _step1b_fix(w: str) -> str:
    if w.endswith(("at", "bl", "iz")):
        return w + "e"
    if _double_cons(w) and not w.endswith(("l", "s", "z")):
        return w[:-1]
    if _measure(w) == 1 and _ends_cvc(w):
        return w + "e"
    return w


def normalize_word(word: str) -> str | None:
    """english-config lexize: stopwords -> None, else stemmed lowercase."""
    w = word.lower()
    if not w or w in STOPWORDS:
        return None
    return porter_stem(w)


# ---------------------------------------------------------------- tsvector
#
# parsed form: dict lexeme -> list[(pos:int, weight:str)]  (weight in
# 'A'..'D'; D is the default and never displayed — tsvector_out).

_TSV_TOKEN = re.compile(r"'((?:[^']|'')+)'|([^\s:]+)")


def parse_tsvector(text: str) -> dict[str, list[tuple[int, str]]]:
    out: dict[str, list[tuple[int, str]]] = {}
    i, n = 0, len(text)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        m = _TSV_TOKEN.match(text, i)
        if not m:
            raise ValueError(f"malformed tsvector near {text[i:]!r}")
        lex = m.group(1).replace("''", "'") if m.group(1) else m.group(2)
        i = m.end()
        poss: list[tuple[int, str]] = []
        if i < n and text[i] == ":":
            i += 1
            pm = re.match(r"[0-9]+[A-Da-d]?(?:,[0-9]+[A-Da-d]?)*", text[i:])
            if not pm:
                raise ValueError(f"malformed position list near {text[i:]!r}")
            for part in pm.group().split(","):
                if part[-1].isalpha():
                    poss.append((int(part[:-1]), part[-1].upper()))
                else:
                    poss.append((int(part), "D"))
            i += pm.end()
        cur = out.setdefault(lex, [])
        cur.extend(poss)
    # canonicalize: sort + dedup positions per lexeme
    for lex, poss in out.items():
        seen: dict[int, str] = {}
        for p, wgt in poss:
            # later weight wins for a duplicated position (tsvector_in)
            seen[p] = wgt
        out[lex] = sorted(seen.items())
    return out


def _quote_lexeme(lex: str) -> str:
    return "'" + lex.replace("'", "''") + "'"


def render_tsvector(entries: dict[str, list[tuple[int, str]]]) -> str:
    parts = []
    for lex in sorted(entries):
        poss = entries[lex]
        if poss:
            ptxt = ",".join(
                f"{p}{w if w != 'D' else ''}" for p, w in poss
            )
            parts.append(f"{_quote_lexeme(lex)}:{ptxt}")
        else:
            parts.append(_quote_lexeme(lex))
    return " ".join(parts)


def tsvector_in(text: str) -> str:
    """tsvector_in + tsvector_out round trip (no dictionary pass)."""
    return render_tsvector(parse_tsvector(text))


def to_tsvector(document: str) -> str:
    """to_tsvector('english'-ish, document): tokenize, drop stopwords,
    stem, record positions."""
    entries: dict[str, list[tuple[int, str]]] = {}
    for pos, tok in enumerate(re.findall(r"[A-Za-z0-9_]+", document), start=1):
        lex = normalize_word(tok)
        if lex is not None:
            entries.setdefault(lex, []).append((pos, "D"))
    return render_tsvector(entries)


# ----------------------------------------------------------------- tsquery
#
# tree nodes (plain tuples so they pickle into UDF closures cheaply):
#   ("val", lexeme, weights:str, prefix:bool)
#   ("not", child) | ("and", l, r) | ("or", l, r) | ("phrase", l, r, dist)
# precedence: | < & < <-> < !   (tsquery_in)

_TSQ_TOKEN = re.compile(
    r"\s*(?:(?P<open>\()|(?P<close>\))|(?P<or>\|)|(?P<and>&)|(?P<not>!)"
    r"|(?P<phrase><(?:->|[0-9]+>))"
    r"|'(?P<qlex>(?:[^']|'')+)'(?P<qflags>:[\*A-Da-d]+)?"
    r"|(?P<lex>[^\s()|&!:<]+)(?P<flags>:[\*A-Da-d]+)?)"
)


class _TsqParser:
    def __init__(self, text: str):
        self.toks: list[tuple[str, object]] = []
        i = 0
        while i < len(text):
            if text[i].isspace():
                i += 1
                continue
            m = _TSQ_TOKEN.match(text, i)
            if not m or m.end() == i:
                raise ValueError(f"malformed tsquery near {text[i:]!r}")
            i = m.end()
            g = m.groupdict()
            if g["open"]:
                self.toks.append(("(", None))
            elif g["close"]:
                self.toks.append((")", None))
            elif g["or"]:
                self.toks.append(("|", None))
            elif g["and"]:
                self.toks.append(("&", None))
            elif g["not"]:
                self.toks.append(("!", None))
            elif g["phrase"]:
                body = m.group("phrase")
                dist = 1 if body == "<->" else int(body[1:-1])
                self.toks.append(("<>", dist))
            else:
                if g["qlex"] is not None:
                    lex, flags = g["qlex"].replace("''", "'"), g["qflags"]
                else:
                    lex, flags = g["lex"], g["flags"]
                prefix, weights = False, ""
                if flags:
                    for c in flags[1:]:
                        if c == "*":
                            prefix = True
                        else:
                            weights += c.upper()
                self.toks.append(("val", (lex, weights, prefix)))
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.parse_or()
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing tsquery tokens: {self.toks[self.i:]}")
        return node

    def parse_or(self):
        left = self.parse_and()
        while self.peek()[0] == "|":
            self.next()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_phrase()
        while self.peek()[0] == "&":
            self.next()
            left = ("and", left, self.parse_phrase())
        return left

    def parse_phrase(self):
        left = self.parse_not()
        while self.peek()[0] == "<>":
            dist = self.next()[1]
            left = ("phrase", left, self.parse_not(), dist)
        return left

    def parse_not(self):
        if self.peek()[0] == "!":
            self.next()
            return ("not", self.parse_not())
        kind, val = self.next()
        if kind == "(":
            node = self.parse_or()
            if self.next()[0] != ")":
                raise ValueError("unbalanced ( in tsquery")
            return node
        if kind == "val":
            lex, weights, prefix = val
            return ("val", lex, weights, prefix)
        raise ValueError(f"unexpected tsquery token {kind!r}")


def parse_tsquery(text: str):
    return _TsqParser(text).parse()


_PREC = {"or": 1, "and": 2, "phrase": 3, "not": 4, "val": 5}


def render_tsquery(node) -> str:
    """tsquery_out canonical form: `!( ... )` parenthesizes complex NOT
    operands, lower-precedence children of & / <-> get `( ... )`."""
    kind = node[0]
    if kind == "val":
        _, lex, weights, prefix = node
        flags = ""
        if prefix or weights:
            flags = ":" + ("*" if prefix else "") + weights
        return _quote_lexeme(lex) + flags
    if kind == "not":
        child = node[1]
        body = render_tsquery(child)
        if _PREC[child[0]] < _PREC["not"]:
            return f"!( {body} )"
        return "!" + body
    op = {"or": "|", "and": "&"}.get(kind)
    if kind == "phrase":
        _, l_n, r_n, dist = node
        op = "<->" if dist == 1 else f"<{dist}>"
    else:
        _, l_n, r_n = node
    lp = f"( {render_tsquery(l_n)} )" if _PREC[l_n[0]] < _PREC[kind] else render_tsquery(l_n)
    # right child at SAME precedence needs parens too for non-associative
    # display fidelity — except PG flattens chains of the same op
    if _PREC[r_n[0]] < _PREC[kind] or (r_n[0] == kind == "phrase"):
        rp = f"( {render_tsquery(r_n)} )"
    else:
        rp = render_tsquery(r_n)
    return f"{lp} {op} {rp}"


def tsquery_in(text: str) -> str:
    return render_tsquery(parse_tsquery(text))


def query_lexemes(node) -> set[tuple[str, str, bool]]:
    if node[0] == "val":
        return {(node[1], node[2], node[3])}
    if node[0] == "not":
        return query_lexemes(node[1])
    return query_lexemes(node[1]) | query_lexemes(node[2])


def tsq_contains(a_text: str, b_text: str) -> bool:
    """tsq_mcontains (`@>`): every lexeme of b appears in a."""
    return query_lexemes(parse_tsquery(b_text)) <= query_lexemes(parse_tsquery(a_text))


# --------------------------------------------- to-tsquery parser family

def plainto_tsquery(text: str) -> str:
    lexes = [normalize_word(t) for t in re.findall(r"[A-Za-z0-9_]+", text)]
    lexes = [x for x in lexes if x is not None]
    if not lexes:
        return ""
    node = ("val", lexes[0], "", False)
    for x in lexes[1:]:
        node = ("and", node, ("val", x, "", False))
    return render_tsquery(node)


def _phrase_node(text: str):
    """Phrase over normalized tokens; distance spans dropped stopwords
    (phraseto_tsquery: 'The Cat and Rats' -> 'cat' <2> 'rat')."""
    toks = [
        (pos, normalize_word(t))
        for pos, t in enumerate(re.findall(r"[A-Za-z0-9_]+", text), start=1)
    ]
    kept = [(p, x) for p, x in toks if x is not None]
    if not kept:
        return None
    node = ("val", kept[0][1], "", False)
    prev = kept[0][0]
    for p, x in kept[1:]:
        node = ("phrase", node, ("val", x, "", False), p - prev)
        prev = p
    return node


def phraseto_tsquery(text: str) -> str:
    node = _phrase_node(text)
    return render_tsquery(node) if node is not None else ""


def websearch_to_tsquery(text: str) -> str:
    """websearch_to_tsquery: unquoted words AND'd, "quoted phrases",
    `or` alternation, `-term` negation."""
    items = re.findall(r'"([^"]*)"|(-?)([A-Za-z0-9_]+)', text)
    groups: list[list] = [[]]  # OR groups of AND'd nodes
    for phrase, neg, word in items:
        if phrase:
            node = _phrase_node(phrase)
            if node is not None:
                groups[-1].append(node)
            continue
        if word.lower() == "or":
            if groups[-1]:
                groups.append([])
            continue
        lex = normalize_word(word)
        if lex is None:
            continue
        node = ("val", lex, "", False)
        if neg:
            node = ("not", node)
        groups[-1].append(node)
    or_nodes = []
    for grp in groups:
        if not grp:
            continue
        node = grp[0]
        for x in grp[1:]:
            node = ("and", node, x)
        or_nodes.append(node)
    if not or_nodes:
        return ""
    node = or_nodes[0]
    for x in or_nodes[1:]:
        node = ("or", node, x)
    return render_tsquery(node)


# ------------------------------------------------------------ combination

def combine_or(a: str, b: str, a_is_query: bool, b_is_query: bool) -> str:
    """gtype_tsquery_or: tsquery OR when either side is a query, else
    tsvector concatenation (positions of b shift past a's max)."""
    if a_is_query or b_is_query:
        return render_tsquery(("or", parse_tsquery(a), parse_tsquery(b)))
    ea, eb = parse_tsvector(a), parse_tsvector(b)
    shift = max((p for poss in ea.values() for p, _ in poss), default=0)
    for lex, poss in eb.items():
        cur = ea.setdefault(lex, [])
        cur.extend((p + shift, w) for p, w in poss)
    return render_tsvector(
        {lex: sorted(dict(poss).items()) for lex, poss in ea.items()}
    )


def combine_and(a: str, b: str) -> str:
    return render_tsquery(("and", parse_tsquery(a), parse_tsquery(b)))


def combine_not(a: str) -> str:
    return render_tsquery(("not", parse_tsquery(a)))


def combine_phrase(a: str, b: str, dist: int = 1) -> str:
    return render_tsquery(("phrase", parse_tsquery(a), parse_tsquery(b), dist))


def ts_delete(tsv: str, lexeme: str) -> str:
    e = parse_tsvector(tsv)
    e.pop(lexeme, None)
    return render_tsvector(e)


def ts_strip(tsv: str) -> str:
    return render_tsvector({lex: [] for lex in parse_tsvector(tsv)})


# ------------------------------------------------------------ match (python)

def ts_match_py(tsv_text: str, node) -> bool:
    entries = parse_tsvector(tsv_text)

    def positions(n):
        """end positions matched by a phrase operand; None = no match."""
        if n[0] == "val":
            _, lex, weights, prefix = n
            keys = (
                [k for k in entries if k.startswith(lex)] if prefix
                else ([lex] if lex in entries else [])
            )
            out = set()
            for k in keys:
                for p, w in entries[k]:
                    if not weights or w in weights:
                        out.add(p)
            return out if keys else None
        if n[0] == "phrase":
            _, l_n, r_n, dist = n
            l_neg, r_neg = l_n[0] == "not", r_n[0] == "not"
            if l_neg and r_neg:
                raise ValueError("phrase with both operands negated")
            if l_neg:  # !a <-> b: b at p where a is NOT at p-dist
                lp = positions(l_n[1]) or set()
                rp = positions(r_n)
                if rp is None:
                    return None
                hits = {p for p in rp if (p - dist) >= 1 and (p - dist) not in lp}
                return hits or None
            if r_neg:  # a <-> !b: a at q where b is NOT at q+dist
                lp = positions(l_n)
                rp = positions(r_n[1]) or set()
                if lp is None:
                    return None
                hits = {q + dist for q in lp if (q + dist) not in rp}
                return hits or None
            lp, rp = positions(l_n), positions(r_n)
            if lp is None or rp is None:
                return None
            hits = {p for p in rp if (p - dist) in lp}
            return hits if hits else None
        if n[0] == "and":
            lp, rp = positions(n[1]), positions(n[2])
            return (lp & rp or None) if lp is not None and rp is not None else None
        if n[0] == "or":
            lp, rp = positions(n[1]), positions(n[2])
            if lp is None:
                return rp
            if rp is None:
                return lp
            return lp | rp
        raise ValueError(f"unsupported phrase operand {n[0]}")

    def ev(n) -> bool:
        if n[0] == "val":
            _, lex, weights, prefix = n
            keys = (
                [k for k in entries if k.startswith(lex)] if prefix
                else ([lex] if lex in entries else [])
            )
            if not keys:
                return False
            if not weights:
                return True
            return any(w in weights for k in keys for _, w in entries[k])
        if n[0] == "not":
            return not ev(n[1])
        if n[0] == "and":
            return ev(n[1]) and ev(n[2])
        if n[0] == "or":
            return ev(n[1]) or ev(n[2])
        if n[0] == "phrase":
            return bool(positions(n))
        raise ValueError(f"unknown tsquery node {n[0]}")

    return ev(node)


_WBIT = {"D": 0, "C": 1, "B": 2, "A": 3}


def tsquery_rpn(text: str) -> list[str]:
    """Flatten a tsquery into postfix (RPN) tokens for the JVM column-
    path evaluator (rpn_match):

      "v:<m>:<lex>"  presence test       "p:<m>:<lex>"  prefix test
      "d:<dist>"     phrase              "l:<dist>"     !a <dist> b
      "r:<dist>"     a <dist> !b         "!" "&" "|"    boolean ops

    <m> is one hex digit encoding the weight restriction as a bitmask
    over (D=1,C=2,B=4,A=8); 0 means unrestricted. The only constructs
    the JVM fold cannot evaluate — a phrase with BOTH operands negated
    (PG errors) and a negation nested deeper inside a phrase operand
    (ts_match_py raises) — return the sentinel ["X"], routing that row
    to the Arrow fallback whose ValueError maps to NULL."""
    node = parse_tsquery(text)
    out: list[str] = []

    def walk(n, in_phrase: bool) -> bool:
        if n[0] == "val":
            _, lex, weights, prefix = n
            m = 0
            for w in set(weights):
                m |= 1 << _WBIT[w]
            out.append(("p:" if prefix else "v:") + format(m, "x") + ":" + lex)
            return True
        if n[0] == "not":
            if in_phrase:
                return False  # only a DIRECT phrase operand may negate
            if not walk(n[1], False):
                return False
            out.append("!")
            return True
        if n[0] in ("and", "or"):
            if not (walk(n[1], in_phrase) and walk(n[2], in_phrase)):
                return False
            out.append("&" if n[0] == "and" else "|")
            return True
        if n[0] == "phrase":
            _, l_n, r_n, dist = n
            l_neg, r_neg = l_n[0] == "not", r_n[0] == "not"
            if l_neg and r_neg:
                return False  # PG errors on this form
            if l_neg:
                ok = walk(l_n[1], True) and walk(r_n, True)
                tag = "l"
            elif r_neg:
                ok = walk(l_n, True) and walk(r_n[1], True)
                tag = "r"
            else:
                ok = walk(l_n, True) and walk(r_n, True)
                tag = "d"
            if not ok:
                return False
            out.append(f"{tag}:{dist}")
            return True
        return False

    return out if walk(node, False) else ["X"]


# -------------------------------------------------------- spark columns
#
# The gval subtype markers live in `j` (see module docstring).

_MARK_TSV = "tsv"
_MARK_TSQ = "tsq"


def gv_tsvector(s: Column) -> Column:
    out = G._mk(G._t_or_null(s, G.T_STRING), s=s, j=F.when(s.isNotNull(), F.lit(_MARK_TSV)))
    return G._tag_types(out, G.T_STRING)


def gv_tsquery(s: Column) -> Column:
    out = G._mk(G._t_or_null(s, G.T_STRING), s=s, j=F.when(s.isNotNull(), F.lit(_MARK_TSQ)))
    return G._tag_types(out, G.T_STRING)


@lru_cache(maxsize=1)
def _udfs():
    """Arrow-batched scalar UDFs for the column (non-literal) paths."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _mk1(fn, ret=T.StringType()):
        def run(s: pd.Series) -> pd.Series:
            def safe(v):
                if v is None:
                    return None
                try:
                    return fn(v)
                except ValueError:
                    return None
            return s.map(safe)

        run.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(ret)(run)

    def _mk2(fn, ret=T.StringType()):
        def run(a: pd.Series, b: pd.Series) -> pd.Series:
            def safe(x, y):
                if x is None or y is None:
                    return None
                try:
                    return fn(x, y)
                except ValueError:
                    return None
            return pd.Series([safe(x, y) for x, y in zip(a, b)])

        run.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
        return pandas_udf(ret)(run)

    return {
        "rpn": _mk1(tsquery_rpn, T.ArrayType(T.StringType())),
        "tsvector_in": _mk1(tsvector_in),
        "tsquery_in": _mk1(tsquery_in),
        "to_tsvector": _mk1(to_tsvector),
        "plainto": _mk1(plainto_tsquery),
        "phraseto": _mk1(phraseto_tsquery),
        "websearch": _mk1(websearch_to_tsquery),
        "strip": _mk1(ts_strip),
        "not": _mk1(combine_not),
        "delete": _mk2(ts_delete),
        "and": _mk2(combine_and),
        "phrase": _mk2(combine_phrase),
        "match": _mk2(
            lambda v, q: ts_match_py(v, parse_tsquery(q)), T.BooleanType()
        ),
        "contains": _mk2(tsq_contains, T.BooleanType()),
        "or": _mk2(lambda a, b: combine_or(a, b, _looks_query(a), _looks_query(b))),
    }


def _looks_query(text: str) -> bool:
    """Heuristic for the UDF `||` path when markers are unavailable:
    operator chars outside quotes mean tsquery."""
    stripped = re.sub(r"'(?:[^']|'')*'", "", text)
    return bool(re.search(r"[|&!<]", stripped))


# ---- JVM-compiled @@ for literal queries --------------------------------

_ENTRY_PAT = r"'((?:[^']|'')+)'(?::([0-9A-D,]+))?"


def tsv_entry_map_w(s: Column) -> Column:
    """Canonical tsvector text -> map<lexeme, array<int>> where each
    element encodes one (position, weight) entry as position*4 + weight
    (D=0, C=1, B=2, A=3) — the entry map every tsquery evaluator
    (literal compile path and column RPN fold) consumes; decoders take
    floor(code/4) for positions and code%4 for the weight. Pure JVM (regex + transforms),
    stays in codegen; canonical text has unique positions per lexeme
    (parse_tsvector dedups), so codes are unique."""
    lex = F.regexp_extract_all(s, F.lit(_ENTRY_PAT), F.lit(1))
    lex = F.transform(lex, lambda x: F.replace(x, F.lit("''"), F.lit("'")))
    pos = F.regexp_extract_all(s, F.lit(_ENTRY_PAT), F.lit(2))

    def code(x: Column) -> Column:
        num = F.regexp_replace(x, "[A-D]", "").cast("int")
        last = x.substr(F.length(x), F.lit(1))
        w = (
            F.when(last == "A", 3)
            .when(last == "B", 2)
            .when(last == "C", 1)
            .otherwise(0)
        )
        return num * 4 + w

    codes = F.transform(
        pos,
        lambda p: F.when(p == "", F.array().cast("array<int>")).otherwise(
            F.transform(F.split(p, ","), code)
        ),
    )
    return F.map_from_arrays(lex, codes)


def gv_if(cond: Column, x: Column, y: Column) -> Column:
    """Field-wise conditional merge of two gvals."""
    return G._mk(
        F.when(cond, x["t"]).otherwise(y["t"]),
        b=F.when(cond, x["b"]).otherwise(y["b"]),
        i=F.when(cond, x["i"]).otherwise(y["i"]),
        d=F.when(cond, x["d"]).otherwise(y["d"]),
        s=F.when(cond, x["s"]).otherwise(y["s"]),
        j=F.when(cond, x["j"]).otherwise(y["j"]),
    )


def ast_ts_literal(e):
    """Compile-time text of an AST subtree that denotes a tsvector /
    tsquery / plain string literal — `(kind, text)` with kind in
    {'tsq','tsv','str'}, or None when not statically known. Lets
    `tsv @@ 'literal query'` compile to pure JVM expressions (PG
    evaluates Const casts at plan time the same way)."""
    from postgraph_spark.plans import ast as A

    if isinstance(e, A.Lit) and isinstance(e.value, str):
        return ("str", e.value)
    _FNS = {
        "totsquery": (tsquery_in, "tsq"),
        "plainto_tsquery": (plainto_tsquery, "tsq"),
        "phraseto_tsquery": (phraseto_tsquery, "tsq"),
        "websearch_to_tsquery": (websearch_to_tsquery, "tsq"),
        "totsvector": (tsvector_in, "tsv"),
        "to_tsvector": (to_tsvector, "tsv"),
    }
    try:
        if isinstance(e, A.Cast) and e.type_name in ("tsquery", "tsvector"):
            inner = ast_ts_literal(e.operand)
            if inner and inner[0] == "str":
                fn, kind = _FNS["totsquery" if e.type_name == "tsquery" else "totsvector"]
                return (kind, fn(inner[1]))
            return inner
        if isinstance(e, A.FuncCall) and e.name.lower() in _FNS and len(e.args) == 1:
            inner = ast_ts_literal(e.args[0])
            if inner and inner[0] == "str":
                fn, kind = _FNS[e.name.lower()]
                return (kind, fn(inner[1]))
            return None
        if isinstance(e, A.BinOp) and e.op == "<->":
            l_t, r_t = ast_ts_literal(e.left), ast_ts_literal(e.right)
            if l_t and r_t and l_t[0] != "tsv" and r_t[0] != "tsv":
                return ("tsq", combine_phrase(l_t[1], r_t[1]))
        if isinstance(e, A.UnaryOp) and e.op == "!!":
            inner = ast_ts_literal(e.operand)
            if inner and inner[0] != "tsv":
                return ("tsq", combine_not(inner[1]))
    except ValueError:
        return None
    return None


def rpn_match(entry_map: Column, rpn: Column) -> Column:
    """Evaluate a postfix tsquery token array (tsquery_rpn) against a
    WEIGHTED tsvector entry map (tsv_entry_map_w) ENTIRELY JVM-side:
    one F.aggregate fold maintaining a stack of (b boolean, pos
    array<int>) structs — b is the node's boolean value, pos its phrase
    position set (NULL = "no match" a la ts_match_py's None, distinct
    from an empty array for a present-but-positionless lexeme).

    Leaves filter the code array by the token's weight mask and project
    codes to positions; "d"/"l"/"r" implement PG phrase distance
    (including one negated operand) with position-set algebra; "&"/"|"
    combine both the booleans and (for phrase subcontexts) the
    intersect/union position semantics. The fold body is one constant-
    size expression evaluated per token at runtime, so plan size does
    not grow with query length. A well-formed query leaves exactly one
    stack value; anything else (the "X" sentinel included) yields NULL
    so the caller can route to the Arrow fallback."""
    ST = "array<struct<b:boolean,pos:array<int>>>"
    empty_pos = F.array().cast("array<int>")
    null_pos = F.lit(None).cast("array<int>")

    def push(stack: Column, b: Column, pos: Column) -> Column:
        return F.concat(stack, F.array(F.struct(b.alias("b"), pos.alias("pos"))))

    def nullify_empty(arr: Column) -> Column:
        return F.when(F.size(arr) > 0, arr)

    def step(acc: Column, tok: Column) -> Column:
        kind = tok.substr(1, 1)
        top = F.element_at(acc, -1)
        top2 = F.element_at(acc, -2)
        pop1 = F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0)))
        pop2 = F.slice(acc, 1, F.greatest(F.size(acc) - 2, F.lit(0)))

        # ---- leaves: "v:<m>:<lex>" / "p:<m>:<lex>"
        mask = F.conv(tok.substr(3, 1), 16, 10).cast("int")
        lex = tok.substr(F.lit(5), F.length(tok))

        def wkeep(c: Column) -> Column:
            bit = (
                F.when(c % 4 == 0, 1)
                .when(c % 4 == 1, 2)
                .when(c % 4 == 2, 4)
                .otherwise(8)
            )
            return (mask == 0) | (mask.bitwiseAND(bit) > 0)

        def to_pos(codes: Column) -> Column:
            return F.array_distinct(
                F.transform(codes, lambda c: F.floor(c / 4).cast("int"))
            )

        ent = F.element_at(entry_map, lex)
        ent_f = F.filter(ent, wkeep)
        v_b = F.when(mask == 0, ent.isNotNull()).otherwise(
            F.coalesce(F.size(ent_f) > 0, F.lit(False))
        )
        v_pos = F.when(ent.isNotNull(), to_pos(ent_f))

        keys = F.filter(F.map_keys(entry_map), lambda k: k.startswith(lex))
        allc = F.filter(
            F.flatten(F.transform(keys, lambda k: F.element_at(entry_map, k))),
            wkeep,
        )
        p_b = F.when(mask == 0, F.size(keys) > 0).otherwise(F.size(allc) > 0)
        p_pos = F.when(F.size(keys) > 0, to_pos(allc))

        # ---- boolean + phrase-context set ops
        lb, rb = top2["b"], top["b"]
        lp, rp = top2["pos"], top["pos"]
        and_pos = F.when(
            lp.isNotNull() & rp.isNotNull(), nullify_empty(F.array_intersect(lp, rp))
        )
        or_pos = (
            F.when(lp.isNull(), rp)
            .when(rp.isNull(), lp)
            .otherwise(F.array_union(lp, rp))
        )

        # ---- phrase distance: "d:<n>" / "l:<n>" / "r:<n>"
        dist = tok.substr(F.lit(3), F.length(tok)).cast("int")
        d_res = F.when(
            lp.isNotNull() & rp.isNotNull(),
            nullify_empty(F.filter(rp, lambda p: F.array_contains(lp, p - dist))),
        )
        lpz, rpz = F.coalesce(lp, empty_pos), F.coalesce(rp, empty_pos)
        l_res = F.when(
            rp.isNotNull(),
            nullify_empty(
                F.filter(
                    rp, lambda p: (p - dist >= 1) & ~F.array_contains(lpz, p - dist)
                )
            ),
        )
        r_res = F.when(
            lp.isNotNull(),
            nullify_empty(
                F.transform(
                    F.filter(lp, lambda q: ~F.array_contains(rpz, q + dist)),
                    lambda q: q + dist,
                )
            ),
        )

        return (
            F.when(kind == "v", push(acc, v_b, v_pos))
            .when(kind == "p", push(acc, p_b, p_pos))
            .when(tok == "!", push(pop1, ~top["b"], null_pos))
            .when(tok == "&", push(pop2, lb & rb, and_pos))
            .when(tok == "|", push(pop2, lb | rb, or_pos))
            .when(kind == "d", push(pop2, d_res.isNotNull(), d_res))
            .when(kind == "l", push(pop2, l_res.isNotNull(), l_res))
            .when(kind == "r", push(pop2, r_res.isNotNull(), r_res))
            # unknown token: poison the stack so the final size test fails
            .otherwise(F.array().cast(ST))
        )

    stack = F.aggregate(rpn, F.array().cast(ST), step)
    return F.when(F.size(stack) == 1, F.element_at(stack, 1)["b"])


def op_match(left_gv: Column, left_ast, right_gv_fn, right_ast) -> Column:
    """`tsv @@ tsq` (also accepts the operands reversed, like PG).
    Literal query -> JVM boolean algebra over the vector's entry map
    (codegen, no Python). A column-valued query splits the work: a tiny
    Arrow UDF flattens the QUERY string to postfix tokens (query-
    proportional — never the corpus side) and the evaluation — boolean
    algebra, weight restrictions, AND phrase distance via position-set
    algebra — runs as a JVM fold over the vector's weighted entry map
    (rpn_match). The only rows that ship their tsvector through the
    full Arrow fallback are queries PG itself errors on (both phrase
    operands negated / negation nested inside a phrase operand), where
    the fallback's ValueError maps to NULL; inputs to it are masked
    NULL for JVM-handled rows, so corpus strings don't cross the Python
    boundary."""
    r_lit = ast_ts_literal(right_ast)
    l_lit = ast_ts_literal(left_ast)
    ls = F.when(left_gv["t"] == G.T_STRING, left_gv["s"])
    if r_lit is not None and r_lit[0] in ("tsq", "str"):
        try:
            node = parse_tsquery(r_lit[1])
            res = compile_match(tsv_entry_map_w(ls), node)
            return G.gv_bool(F.when(ls.isNotNull(), res))
        except ValueError:
            return G.gv_bool(F.lit(None).cast("boolean"))
    if l_lit is not None and l_lit[0] == "tsq":
        # query on the left, vector column on the right
        right_gv = right_gv_fn()
        rs = F.when(right_gv["t"] == G.T_STRING, right_gv["s"])
        try:
            node = parse_tsquery(l_lit[1])
            res = compile_match(tsv_entry_map_w(rs), node)
            return G.gv_bool(F.when(rs.isNotNull(), res))
        except ValueError:
            return G.gv_bool(F.lit(None).cast("boolean"))
    right_gv = right_gv_fn()
    rs = F.when(right_gv["t"] == G.T_STRING, right_gv["s"])
    # runtime marker decides which side is the query
    left_is_q = left_gv["j"] == _MARK_TSQ
    v = F.when(left_is_q, rs).otherwise(ls)
    q = F.when(left_is_q, ls).otherwise(rs)
    rpn = _udfs()["rpn"](q)
    jvm = rpn_match(tsv_entry_map_w(v), rpn)
    # fallback rows: parse failure (rpn null with non-null q) or the
    # unsupported-construct sentinel; mask the inputs elsewhere so the
    # corpus-side tsvector never reaches Python for JVM-handled rows
    fallback = q.isNotNull() & (rpn.isNull() | F.array_contains(rpn, "X"))
    py = _udfs()["match"](
        F.when(fallback, v), F.when(fallback, q)
    )
    res = F.when(v.isNotNull() & q.isNotNull(), F.when(fallback, py).otherwise(jvm))
    return G.gv_bool(res)


def _lit_or(kind_fn, a_lit, b_lit):
    try:
        return kind_fn(a_lit, b_lit)
    except ValueError:
        return None


def op_phrase(a_gv: Column, b_gv: Column, a_ast, b_ast) -> Column:
    """`<->` (tsquery_phrase distance 1)."""
    a_lit, b_lit = ast_ts_literal(a_ast), ast_ts_literal(b_ast)
    if a_lit and b_lit:
        return gv_tsquery(F.lit(_lit_or(combine_phrase, a_lit[1], b_lit[1])))
    a_s = F.when(a_gv["t"] == G.T_STRING, a_gv["s"])
    b_s = F.when(b_gv["t"] == G.T_STRING, b_gv["s"])
    return gv_tsquery(_udfs()["phrase"](a_s, b_s))


def op_tsand(a_gv: Column, b_gv: Column, a_ast=None, b_ast=None) -> Column:
    """tsquery `&` (gtype_ops.c wires `&` for tsquery operands)."""
    a_lit = ast_ts_literal(a_ast) if a_ast is not None else None
    b_lit = ast_ts_literal(b_ast) if b_ast is not None else None
    if a_lit and b_lit:
        return gv_tsquery(F.lit(_lit_or(combine_and, a_lit[1], b_lit[1])))
    a_s = F.when(a_gv["t"] == G.T_STRING, a_gv["s"])
    b_s = F.when(b_gv["t"] == G.T_STRING, b_gv["s"])
    return gv_tsquery(_udfs()["and"](a_s, b_s))


def op_tsnot(a_gv: Column, a_ast=None) -> Column:
    """`!!` (gtype_tsquery_not)."""
    a_lit = ast_ts_literal(a_ast) if a_ast is not None else None
    if a_lit and a_lit[0] != "tsv":
        try:
            return gv_tsquery(F.lit(combine_not(a_lit[1])))
        except ValueError:
            return gv_tsquery(F.lit(None).cast("string"))
    return gv_tsquery(_udfs()["not"](F.when(a_gv["t"] == G.T_STRING, a_gv["s"])))


def op_concat(a_gv: Column, b_gv: Column, a_ast=None, b_ast=None) -> Column:
    """`||` — gtype_tsquery_or dispatch: tsquery OR when either side is
    a tsquery, tsvector concat when either is a tsvector, plain text
    concatenation for ordinary strings, array concatenation for arrays
    (PG textcat / array_cat)."""
    a_lit = ast_ts_literal(a_ast) if a_ast is not None else None
    b_lit = ast_ts_literal(b_ast) if b_ast is not None else None
    if a_lit and b_lit and (a_lit[0] != "str" or b_lit[0] != "str"):
        is_q = a_lit[0] == "tsq" or b_lit[0] == "tsq"
        txt = _lit_or(
            lambda x, y: combine_or(x, y, a_lit[0] == "tsq", b_lit[0] == "tsq"),
            a_lit[1], b_lit[1],
        )
        return (gv_tsquery if is_q else gv_tsvector)(F.lit(txt))
    ta, tb = G.gv_types(a_gv), G.gv_types(b_gv)
    may_str = G.T_STRING in ta and G.T_STRING in tb
    may_arr = G.T_ARRAY in ta and G.T_ARRAY in tb
    both_str = (a_gv["t"] == G.T_STRING) & (b_gv["t"] == G.T_STRING)
    branches = []
    if may_str:
        marked = (
            a_gv["j"].isin(_MARK_TSQ, _MARK_TSV)
            | b_gv["j"].isin(_MARK_TSQ, _MARK_TSV)
        )
        is_q = (a_gv["j"] == _MARK_TSQ) | (b_gv["j"] == _MARK_TSQ)
        ts_txt = _udfs()["or"](a_gv["s"], b_gv["s"])
        ts_out = gv_if(is_q, gv_tsquery(ts_txt), gv_tsvector(ts_txt))
        branches.append((both_str & marked, ts_out))
        branches.append((both_str, G.gv_str(F.concat(a_gv["s"], b_gv["s"]))))
    if may_arr:
        both_arr = (a_gv["t"] == G.T_ARRAY) & (b_gv["t"] == G.T_ARRAY)
        arr_j = (
            F.when(a_gv["j"] == "[]", b_gv["j"])
            .when(b_gv["j"] == "[]", a_gv["j"])
            .otherwise(
                F.concat(
                    F.regexp_replace(a_gv["j"], r"\]$", ""), F.lit(","),
                    F.regexp_replace(b_gv["j"], r"^\[", ""),
                )
            )
        )
        branches.append((both_arr, G.gv_array_json(arr_j)))
    out = G.gv_null()
    for cond, val in reversed(branches):
        out = gv_if(cond, val, out)
    return out


def op_tsq_contains(a_gv: Column, b_gv: Column, contained_by: bool = False) -> Column:
    """tsquery `@>` / `<@` (tsq_mcontains) for runtime-marked queries."""
    a_s = F.when(a_gv["t"] == G.T_STRING, a_gv["s"])
    b_s = F.when(b_gv["t"] == G.T_STRING, b_gv["s"])
    res = _udfs()["contains"](b_s, a_s) if contained_by else _udfs()["contains"](a_s, b_s)
    return G.gv_bool(res)


def compile_match(entry_map: Column, node) -> Column:
    """tsv @@ <literal tsquery> as JVM boolean algebra over the
    WEIGHTED entry map (tsv_entry_map_w). Phrase distance uses the
    decoded position arrays; weight restrictions filter the codes at
    the leaf — exact ts_match_py semantics, same as the column path."""

    def _wfilter(codes: Column, weights: str) -> Column:
        if not weights:
            return codes
        allowed = sorted({_WBIT[w] for w in weights})
        return F.filter(codes, lambda c: (c % 4).isin(allowed))

    def _to_pos(codes: Column) -> Column:
        return F.array_distinct(
            F.transform(codes, lambda c: F.floor(c / 4).cast("int"))
        )

    def val_positions(n) -> Column:
        _, lex, weights, prefix = n
        if prefix:
            # union of positions across prefix-matching keys; NULL when
            # no key matches (ts_match_py's None)
            keys = F.filter(
                F.map_keys(entry_map), lambda k: k.startswith(F.lit(lex))
            )
            allc = _wfilter(
                F.flatten(F.transform(keys, lambda k: F.element_at(entry_map, k))),
                weights,
            )
            return F.when(F.size(keys) > 0, _to_pos(allc))
        ent = F.element_at(entry_map, F.lit(lex))
        return F.when(ent.isNotNull(), _to_pos(_wfilter(ent, weights)))

    def positions(n) -> Column:
        if n[0] == "val":
            return val_positions(n)
        if n[0] == "phrase":
            _, l_n, r_n, dist = n
            l_neg, r_neg = l_n[0] == "not", r_n[0] == "not"
            if l_neg and r_neg:
                raise ValueError("phrase with both operands negated")
            empty = F.array().cast("array<int>")
            if l_neg:  # !a <-> b
                lp = F.coalesce(positions(l_n[1]), empty)
                rp = positions(r_n)
                return F.when(
                    rp.isNotNull(),
                    F.filter(
                        rp,
                        lambda p: (p - dist >= 1) & ~F.array_contains(lp, p - dist),
                    ),
                )
            if r_neg:  # a <-> !b
                lp = positions(l_n)
                rp = F.coalesce(positions(r_n[1]), empty)
                return F.when(
                    lp.isNotNull(),
                    F.transform(
                        F.filter(lp, lambda q: ~F.array_contains(rp, q + dist)),
                        lambda q: q + dist,
                    ),
                )
            lp, rp = positions(l_n), positions(r_n)
            return F.when(
                lp.isNotNull() & rp.isNotNull(),
                F.filter(rp, lambda p: F.array_contains(lp, p - dist)),
            )
        if n[0] == "and":
            lp, rp = positions(n[1]), positions(n[2])
            return F.when(
                lp.isNotNull() & rp.isNotNull(),
                F.array_intersect(lp, rp),
            )
        if n[0] == "or":
            lp, rp = positions(n[1]), positions(n[2])
            return F.when(lp.isNotNull() & rp.isNotNull(), F.array_union(lp, rp)).otherwise(
                F.coalesce(lp, rp)
            )
        raise ValueError(f"unsupported phrase operand {n[0]}")

    def ev(n) -> Column:
        if n[0] == "val":
            _, lex, weights, prefix = n
            if prefix:
                keys = F.filter(
                    F.map_keys(entry_map), lambda k: k.startswith(F.lit(lex))
                )
                if not weights:
                    return F.size(keys) > 0
                allc = F.flatten(
                    F.transform(keys, lambda k: F.element_at(entry_map, k))
                )
                return F.size(_wfilter(allc, weights)) > 0
            ent = F.element_at(entry_map, F.lit(lex))
            if not weights:
                return ent.isNotNull()
            return F.coalesce(F.size(_wfilter(ent, weights)) > 0, F.lit(False))
        if n[0] == "not":
            return ~ev(n[1])
        if n[0] == "and":
            return ev(n[1]) & ev(n[2])
        if n[0] == "or":
            return ev(n[1]) | ev(n[2])
        if n[0] == "phrase":
            p = positions(n)
            return p.isNotNull() & (F.size(p) > 0)
        raise ValueError(f"unknown tsquery node {n[0]}")

    return ev(node)
