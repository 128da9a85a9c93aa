"""Vector function family (reference vector.c, 865 LoC, 11 fns:
``l2_distance <->``, ``inner_product``, ``negative_inner_product <#>``,
``cosine_distance <=>``, ``spherical_distance``, ``l1_distance``,
``norm``, ``dims``, ``l2_squared_distance``, elementwise arithmetic —
sql/postgraph-gtype.sql.in:347-380 wires the IVFFlat opclasses over
them).

Spark design: a vector is ``array<float|double>``; every function is a
pure JVM expression (``zip_with`` + ``aggregate``) — codegen'd, no
Python, no shuffle, column-prunable. At 100 TB these run inside the
scan stage; the ANN path (operators/similarity.py) partitions by
cluster id and reuses these same expressions within each partition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ZERO = "CAST(0.0 AS DOUBLE)"


def _dsum(arr: Column) -> Column:
    """sum an array<double> via aggregate (JVM fold, no explode)."""
    return F.aggregate(arr, F.expr(_ZERO), lambda acc, x: acc + x)


def dims(v: Column) -> Column:
    """vector dimension count (vector.c `dims`)."""
    return F.size(v)


def l2_squared_distance(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2)
    return _dsum(d)


def l2_distance(a: Column, b: Column) -> Column:
    """`<->` (vector.c l2_distance)."""
    return F.sqrt(l2_squared_distance(a, b))


def l1_distance(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double")))
    return _dsum(d)


def inner_product(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return _dsum(d)


def negative_inner_product(a: Column, b: Column) -> Column:
    """`<#>` — pgvector convention: ANN indexes maximize inner product by
    minimizing its negation."""
    return -inner_product(a, b)


def l2_norm(v: Column) -> Column:
    return F.sqrt(_dsum(F.transform(v, lambda x: x.cast("double") ** 2)))


def cosine_distance(a: Column, b: Column) -> Column:
    """`<=>` = 1 - cos(a, b) (vector.c cosine_distance)."""
    return 1.0 - inner_product(a, b) / (l2_norm(a) * l2_norm(b))


def spherical_distance(a: Column, b: Column) -> Column:
    """acos(cos_sim)/pi on unit-normalized inputs (vector.c)."""
    cos_sim = inner_product(a, b) / (l2_norm(a) * l2_norm(b))
    return F.acos(F.least(F.greatest(cos_sim, F.lit(-1.0)), F.lit(1.0))) / float(3.141592653589793)


def vec_add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x.cast("double") + y.cast("double"))


def vec_sub(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))


def vec_scale(a: Column, k: Column | float) -> Column:
    k = F.lit(k) if isinstance(k, (int, float)) else k
    return F.transform(a, lambda x: x.cast("double") * k)
