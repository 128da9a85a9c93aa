"""Derive a deterministic 10x scale-up of an sf directory (default:
sf0.1 -> an sf1-equivalent) for scale-linearity measurement.

/root/testdata is read-only and the driver only generates up to sf0.1,
so the sf1 bench pass (round-8 verdict #2) derives its data: ten
key-shifted copies of every fact table, with referential integrity
preserved (all foreign keys shift by the same per-copy offset) and the
two similarity corpora perturbed per copy so CROSS-copy documents and
embeddings are not near-duplicates (otherwise dedup/LSH outputs grow
quadratically in the copy count and runtime ratios stop measuring
engine linearity):

- documents: every second word gains a copy-keyed suffix, so every
  3-gram shingle of copy k differs from every other copy's (+~25%
  bytes); within-copy dup/near-dup structure is preserved exactly
  (the transform is a pure function of (word position, k)).
- embeddings: the vector is rotated by k positions — within-copy
  geometry is preserved (rotation is an isometry), cross-copy cosine
  similarity is scrambled.
- region/nation stay fixed (dimensions).

Usage: python tools/gen_scale.py [src_dir] [dst_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 10**9  # per-copy key offset: far above any sf0.1 key, < 2^48/10


def gen(src: str, dst: str, copies: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def rd(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    def write(t: str, union_sql: str) -> None:
        out = f"{dst}/{t}.parquet"
        con.execute(f"COPY ({union_sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows")

    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {rd(t)}")

    def shifted(t: str, proj: str) -> str:
        return " UNION ALL ".join(
            f"SELECT {proj.format(k=k, off=k * OFF)} FROM {rd(t)}"
            for k in range(copies)
        )

    write("customer", shifted("customer",
          "c_custkey + {off} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment"))
    write("supplier", shifted("supplier",
          "s_suppkey + {off} AS s_suppkey, s_name, s_nationkey, s_acctbal"))
    write("part", shifted("part",
          "p_partkey + {off} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice"))
    write("orders", shifted("orders",
          "o_orderkey + {off} AS o_orderkey, o_custkey + {off} AS o_custkey, "
          "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"))
    write("lineitem", shifted("lineitem",
          "l_orderkey + {off} AS l_orderkey, l_partkey + {off} AS l_partkey, "
          "l_suppkey + {off} AS l_suppkey, l_linenumber, l_quantity, "
          "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"))
    write("events", shifted("events",
          "event_id + {off} AS event_id, ts, user_id + {off} AS user_id, "
          "event_type, value, props"))
    # copy-keyed suffix on every 2nd word -> every 3-gram differs across
    # copies; copy 0 keeps the original text verbatim
    write("documents", shifted("documents",
          "doc_id + {off} AS doc_id, "
          "CASE WHEN {k} = 0 THEN text ELSE array_to_string("
          "list_transform(string_split(text, ' '), "
          "(w, i) -> CASE WHEN i % 2 = 0 THEN w || 'z{k}' ELSE w END), ' ') "
          "END AS text, lang, source, n_chars"))
    # rotate the embedding by k (isometry within a copy, scrambles
    # cross-copy cosine); copy 0 is verbatim
    write("embeddings", shifted("embeddings",
          "vec_id + {off} AS vec_id, "
          "CASE WHEN {k} = 0 THEN embedding "
          "ELSE embedding[{k}+1:] || embedding[1:{k}] END AS embedding, label"))


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    gen(src, dst, copies)
