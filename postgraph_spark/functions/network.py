"""Network address function kit (reference gtype_network.c, 213 LoC,
13 fns over inet/cidr/macaddr: abbrev broadcast family host hostmask
masklen netmask network set_masklen ... plus subnet operators
`<< <<= >> >>= &&` in gtype_ops.c:756-827).

Spark has no inet type; addresses travel as strings ('10.1.2.3/24').
The kit is a family of **vectorized pandas UDFs** over Python's
``ipaddress`` module — Arrow-batched (one Python crossing per batch,
not per row), the sanctioned slow-path shape when no JVM expression
exists. Functions are defined at import time against module-scope
helpers; closures capture everything by value so executor workers do
not need this package importable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _mk_udf(fn, ret=T.StringType()):
    @pandas_udf(ret)
    def _udf(s: pd.Series) -> pd.Series:
        import ipaddress

        def safe(v):
            if v is None:
                return None
            try:
                return fn(ipaddress.ip_interface(v))
            except ValueError:
                return None

        return s.map(safe)

    return _udf


#: host(inet) — the bare address, no mask (gtype_network.c host)
host = _mk_udf(lambda i: str(i.ip))
#: masklen(inet) — prefix length
masklen = _mk_udf(lambda i: i.network.prefixlen, ret=T.IntegerType())
#: family(inet) — 4 or 6
family = _mk_udf(lambda i: i.version, ret=T.IntegerType())
#: network(inet) — the network part as cidr text
network = _mk_udf(lambda i: str(i.network))
#: broadcast(inet) — highest address in the network
broadcast = _mk_udf(lambda i: str(i.network.broadcast_address))
#: netmask(inet)
netmask = _mk_udf(lambda i: str(i.network.netmask))
#: hostmask(inet)
hostmask = _mk_udf(lambda i: str(i.network.hostmask))
#: abbrev(inet) — display form (PG abbrev(inet) = text without /32)
abbrev = _mk_udf(lambda i: str(i.ip) if i.network.prefixlen == i.ip.max_prefixlen else str(i))


def set_masklen(col: Column, prefix: int) -> Column:
    @pandas_udf(T.StringType())
    def _set(s: pd.Series) -> pd.Series:
        import ipaddress

        def safe(v):
            if v is None:
                return None
            try:
                iface = ipaddress.ip_interface(v)
                return f"{iface.ip}/{prefix}"
            except ValueError:
                return None

        return s.map(safe)

    return _set(col)


@pandas_udf(T.StringType())
def set_masklen_col(s: pd.Series, prefix: pd.Series) -> pd.Series:
    """set_masklen(inet, int) with a COLUMN prefix (the Cypher-callable
    form; gtype_network.c set_masklen)."""
    import ipaddress

    def safe(v, p):
        if v is None or p is None:
            return None
        try:
            iface = ipaddress.ip_interface(v)
            if not 0 <= int(p) <= iface.ip.max_prefixlen:
                return None
            return f"{iface.ip}/{int(p)}"
        except ValueError:
            return None

    return pd.Series([safe(v, p) for v, p in zip(s, prefix)])


@pandas_udf(T.BooleanType())
def subnet_contains(net: pd.Series, addr: pd.Series) -> pd.Series:
    """`>>` — net strictly contains addr's network (gtype_ops.c:756-827)."""
    import ipaddress

    def safe(n, a):
        if n is None or a is None:
            return None
        try:
            nn = ipaddress.ip_interface(n).network
            an = ipaddress.ip_interface(a).network
            return an.subnet_of(nn) and an != nn
        except (ValueError, TypeError):
            return None

    return pd.Series([safe(n, a) for n, a in zip(net, addr)])


def _mk_subnet_udf(test):
    """Factory for the inet subnet OPERATORS `<< <<= >> >>= &&`
    (gtype_ops.c:756-827 over PG's network_sub/subeq/sup/supeq/overlap;
    old/regress/network.sql:232-264). PG semantics: family mismatch is
    false (not error), unparsable input is null. Comparing the
    interfaces' .network objects is equivalent to PG's raw-bit compare:
    only bits up to the wider mask matter, and python network equality
    includes the prefix length (strictness)."""

    @pandas_udf(T.BooleanType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        import ipaddress

        def parse(v):
            try:
                return ipaddress.ip_interface(v).network
            except ValueError:
                # PG's abbreviated cidr form ('192.168.1/24',
                # old/regress/network.sql): pad the missing octets
                if "/" in v and ":" not in v:
                    addr, mask = v.split("/", 1)
                    parts = addr.split(".")
                    if 1 <= len(parts) < 4 and all(p.isdigit() for p in parts):
                        addr = ".".join(parts + ["0"] * (4 - len(parts)))
                        return ipaddress.ip_interface(f"{addr}/{mask}").network
                raise

        def safe(x, y):
            if x is None or y is None:
                return None
            try:
                xn, yn = parse(x), parse(y)
            except ValueError:
                return None
            if xn.version != yn.version:
                return False
            return test(xn, yn)

        return pd.Series([safe(x, y) for x, y in zip(a, b)])

    return _udf


#: `<<` — lhs is a STRICT subnet of rhs (network_sub)
subnet_contained_strict = _mk_subnet_udf(lambda a, b: a.subnet_of(b) and a != b)
#: `<<=` — subnet of or equal (network_subeq)
subnet_contained_eq = _mk_subnet_udf(lambda a, b: a.subnet_of(b))
#: `>>` — lhs STRICTLY contains rhs (network_sup)
subnet_contains_strict = _mk_subnet_udf(lambda a, b: b.subnet_of(a) and a != b)
#: `>>=` — contains or equal (network_supeq)
subnet_contains_eq = _mk_subnet_udf(lambda a, b: b.subnet_of(a))
#: `&&` — either contains the other (network_overlap)
subnet_overlap = _mk_subnet_udf(lambda a, b: a.subnet_of(b) or b.subnet_of(a))


@pandas_udf(T.BooleanType())
def inet_same_family(a: pd.Series, b: pd.Series) -> pd.Series:
    import ipaddress

    def safe(x, y):
        if x is None or y is None:
            return None
        try:
            return ipaddress.ip_interface(x).version == ipaddress.ip_interface(y).version
        except ValueError:
            return None

    return pd.Series([safe(x, y) for x, y in zip(a, b)])


@pandas_udf(T.StringType())
def inet_merge(a: pd.Series, b: pd.Series) -> pd.Series:
    """inet_merge(inet, inet) -> cidr — the smallest network containing
    both (gtype_network.c:103-113 -> PG inet_merge). PG errors on a
    family mismatch; the kit's 3VL convention is null, as for
    unparseable input."""
    import ipaddress

    def safe(x, y):
        if x is None or y is None:
            return None
        try:
            na = ipaddress.ip_interface(x).network
            nb = ipaddress.ip_interface(y).network
        except ValueError:
            return None
        if na.version != nb.version:
            return None
        # walk the prefix down from the shorter of the two until the
        # truncated network addresses agree
        bits = na.network_address.max_prefixlen
        pa, pb = int(na.network_address), int(nb.network_address)
        pref = min(na.prefixlen, nb.prefixlen)
        while pref > 0 and (pa >> (bits - pref)) != (pb >> (bits - pref)):
            pref -= 1
        base = ((pa >> (bits - pref)) << (bits - pref)) if pref else 0
        return str(ipaddress.ip_network((base, pref)))

    return pd.Series([safe(x, y) for x, y in zip(a, b)])
