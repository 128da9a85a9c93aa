"""gcd / lcm over gtype numbers (gtype_numbers.c:142-194): two integers
take the int8gcd/int8lcm path (exact int64, non-negative result,
gcd(0,0) = 0); any float operand takes the numeric path — PG converts
float8 to numeric through its shortest round-trip text and runs exact
decimal Euclid, reproduced here with Fraction(Decimal(repr(x))).

Arrow-batched pandas UDF (two scalars in, struct{i,d} out) — the
int/float dispatch is per-row DYNAMIC in the reference (a column can
mix), so it cannot be a static plan branch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_OUT = T.StructType(
    [T.StructField("i", T.LongType()), T.StructField("d", T.DoubleType())]
)


def _frac(v: float):
    from decimal import Decimal
    from fractions import Fraction

    return Fraction(Decimal(repr(float(v))))


def _mk(op):
    @pandas_udf(_OUT)
    def _udf(ai: pd.Series, ad: pd.Series, bi: pd.Series, bd: pd.Series) -> pd.DataFrame:
        import math

        out_i, out_d = [], []
        for x_i, x_d, y_i, y_d in zip(ai, ad, bi, bd):
            if pd.isna(x_d) or pd.isna(y_d):
                out_i.append(None)
                out_d.append(None)
                continue
            if not pd.isna(x_i) and not pd.isna(y_i):
                g = (
                    math.gcd(int(x_i), int(y_i))
                    if op == "gcd"
                    else math.lcm(int(x_i), int(y_i))
                )
                out_i.append(g)
                out_d.append(float(g))
                continue
            fx, fy = _frac(x_d), _frac(y_d)
            # gcd(p1/q1, p2/q2) = gcd(p1*q2, p2*q1) / (q1*q2);
            # lcm = |a*b| / gcd (0 when either is 0)
            num = math.gcd(
                abs(fx.numerator * fy.denominator), abs(fy.numerator * fx.denominator)
            )
            den = fx.denominator * fy.denominator
            from fractions import Fraction

            g = Fraction(num, den)
            if op == "lcm":
                g = abs(fx * fy) / g if g else Fraction(0)
            out_i.append(None)
            out_d.append(float(g))
        return pd.DataFrame({"i": pd.array(out_i, dtype="Int64"), "d": out_d})

    return _udf


gcd_num = _mk("gcd")
lcm_num = _mk("lcm")
