"""Operator registry: one entry per engine operator (SURVEY.md §2.C).

Each operator registers a Spark callable ``(spark, sf_dir) -> DataFrame``
and, when SQL-expressible, a DuckDB oracle SQL string computing the same
result over the same parquet tables. ``__spark_entry__.py`` re-exports
this registry to the driver, which hash-compares Spark vs DuckDB output
(columns sorted by name, order-insensitive).

Conventions enforced here:
* every computed column is aliased identically in Spark and SQL;
* floating aggregates are rounded (both sides) so double summation-order
  differences between engines can't flip low bits;
* every ORDER BY carries a unique tiebreaker (hash compare is
  order-insensitive, but LIMIT/top-k must select a deterministic set).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from awsbeats_spark.functions.rounding import rewrite_round_sql

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver records rows-only check
    tags: tuple[str, ...] = ()


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering an engine operator under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate operator name {name!r}")
        sql = rewrite_round_sql(oracle) if oracle is not None else None
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=sql, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and
    return the full registry."""
    from awsbeats_spark import operators  # noqa: F401  (triggers imports)

    return QUERIES
