"""Deterministic, content-keyed sampling for corpus curation.

A training pipeline samples constantly — held-out splits, ablation
subsets, per-source mixture weights — and at 100 TB the sample must be
(a) reproducible across runs and engines, (b) a pure per-row predicate
so it pushes into the scan with zero shuffle and no RNG state, and
(c) stable under repartitioning (Spark's df.sample is none of these:
it is seed+partition dependent). The standard trick: hash a stable key
and keep rows whose hash falls below fraction * keyspace.

md5 is used as the hash (not xxhash64) deliberately: it is
engine-portable — the same row selects in Spark, DuckDB, Trino,
Postgres — so a sample drawn here is reproducible by any downstream
auditor. The first 8 hex chars compare lexicographically exactly like
the 32-bit numeric prefix (fixed width, lowercase), so the predicate
stays a string compare that every engine evaluates identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 16**8  # 8 hex chars = 32-bit keyspace


def _hex_threshold(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _SPACE), _SPACE - 1), "08x")


def _coord(key_cols: list[str], salt: str) -> Column:
    parts = [F.col(c).cast("string") for c in key_cols]
    if salt:
        parts.append(F.lit(salt))
    k = F.concat_ws("\x1f", *parts)  # single unsalted key = md5(key) verbatim
    return F.substring(F.md5(k), 1, 8)


def deterministic_sample(
    df: DataFrame, key_cols: list[str], fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows, selected by the md5 of their key columns.
    Same key -> same decision, always; disjoint salts -> independent
    samples (e.g. train/val splits that can never overlap: sample the
    val split from the rows the train salt REJECTED)."""
    return df.filter(_coord(key_cols, salt) < _hex_threshold(fraction))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weights
    primitive (e.g. keep 50% of 'en', 10% of everything else). The
    threshold is a CASE on the stratum, still a pure scan predicate."""
    thr = F.lit(_hex_threshold(default))
    for value, frac in fractions.items():
        thr = F.when(F.col(strata_col) == value, F.lit(_hex_threshold(frac))).otherwise(
            thr
        )
    return df.filter(_coord(key_cols, salt) < thr)
