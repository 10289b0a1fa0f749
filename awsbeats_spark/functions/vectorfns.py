"""Vector (embedding) column builders for similarity operators.

Cosine is computed in DOUBLE with strictly sequential left-to-right
accumulation on both engines (F.aggregate here, list_dot_product on
DOUBLE[] in DuckDB), so oracle values agree to the last bit before the
output rounding.

All JVM-side higher-order functions — the 64-dim dot product stays in
whole-stage codegen; no Python crosses the row boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


#: DuckDB twin: cosine between two DOUBLE[] columns
def cosine_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))))"
    )


def sign_signature(v: Column, n_bits: int = 16, stride: int = 4) -> Column:
    """Coordinate-hyperplane LSH signature: bit i = (v[stride*i] > 0).

    A deterministic random-hyperplane LSH family (the hyperplanes are the
    coordinate axes at the strided dims). Vectors in the same bucket are
    near-duplicate candidates; at 100 TB the bucket join replaces the
    O(n²) cross product with a hash join on the signature."""
    return F.concat(
        *[
            F.when(F.element_at(v, stride * i + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_bits)
        ]
    )


def sign_signature_sql(v: str, n_bits: int = 16, stride: int = 4) -> str:
    parts = " || ".join(
        f"(CASE WHEN {v}[{stride * i + 1}] > 0 THEN '1' ELSE '0' END)" for i in range(n_bits)
    )
    return f"({parts})"
