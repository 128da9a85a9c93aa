"""Strict driver-mimicking oracle comparator.

Mirrors what the round driver does: run each __spark_entry__.queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, sort columns by name,
sort rows, and hash RAW values (no canonicalisation, no rounding). Any
difference the driver would flag, this flags — with the first mismatching
column/row printed so we can fix the representation, not guess.

Usage: python tools/strict_compare.py [query ...]   (default: all)
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for col in df.columns:
        for v in df[col].tolist():
            h.update(repr(v).encode())
    return h.hexdigest()


def main(selected: list[str]) -> int:
    import __spark_entry__ as entry
    from postgraph_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = selected or list(queries)
    n_fail = 0
    for qname in names:
        fn = queries[qname]
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {qname}: spark err {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        sql = oracles.get(qname)
        if sql is None:
            print(f"SKIP {qname}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {qname}: oracle err {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        try:
            s, o = _canon(sdf), _canon(odf)
        except TypeError as exc:
            print(f"FAIL {qname}: canon err {exc} (unhashable col?)")
            n_fail += 1
            continue
        if list(s.columns) != list(o.columns):
            print(f"FAIL {qname}: cols spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {qname}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        if _hash(s) != _hash(o):
            n_fail += 1
            # find first differing column and sample values
            bad = []
            for col in s.columns:
                sv, ov = s[col].tolist(), o[col].tolist()
                for i, (a, b) in enumerate(zip(sv, ov)):
                    if repr(a) != repr(b):
                        bad.append((col, i, repr(a)[:60], repr(b)[:60]))
                        break
            print(f"FAIL {qname}: hash mismatch -> {bad[:4]}")
            continue
        print(f"ok   {qname} ({len(s)} rows)")
    print(f"\n{n_fail} failures / {len(names)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
