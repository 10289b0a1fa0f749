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


def _dot_sql(a: str, b: str) -> str:
    # 0.0D: the D suffix keeps the seed a DOUBLE literal — a bare 0.0
    # parses as DECIMAL in Spark SQL and would change the fold's type
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product. Plain column NAMES parse as one SQL
    string (1 py4j roundtrip instead of ~15 — the round-11 build profile
    showed similarity-operator DataFrame construction dominated by
    driver socket hops); Column inputs keep the API form. Identical
    Catalyst expression either way."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(f"sqrt({_dot_sql(a, a)})")
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"
        )
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


# --------------------------------------------------------------------------
# Content-addressed N(0,1) weights (Box-Muller over md5-derived uniforms)
# --------------------------------------------------------------------------


def jl_gauss(i: Column, j: int) -> Column:
    """Spark column for the N(0,1) projection weight g(i, j): Box-Muller
    over two md5-derived uniforms, content-addressed by the (source
    index, target index) pair — every executor regenerates the exact
    same matrix locally with no RNG state and no broadcast, and the
    DuckDB twin (jl_gauss_sql) reproduces it bit-for-bit."""
    import math as _m

    seed = F.md5(F.concat(i.cast("string"), F.lit(f":{j}")))
    u1 = (
        F.conv(F.substring(seed, 1, 8), 16, 10).cast("double") + 0.5
    ) / 4294967296.0
    u2 = (
        F.conv(F.substring(seed, 9, 8), 16, 10).cast("double") + 0.5
    ) / 4294967296.0
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * _m.pi * u2)


def jl_gauss_sql(j: int, k_expr: str) -> str:
    """DuckDB twin of jl_gauss: same md5 seed, same Box-Muller."""
    seed = f"md5({k_expr}::VARCHAR || ':{j}')"
    u1 = f"((('0x' || substring({seed}, 1, 8))::BIGINT + 0.5) / 4294967296.0)"
    u2 = f"((('0x' || substring({seed}, 9, 8))::BIGINT + 0.5) / 4294967296.0)"
    return f"(sqrt(-2.0 * ln({u1})) * cos(2.0 * pi() * {u2}))"
