"""Table catalog: load the driver's parquet tables for a scale-factor dir.

The ten tables (TESTDATA.md / FIXTURES.md) are read straight from parquet
so Catalyst gets native predicate pushdown + column pruning. Timestamps
are normalized by Spark itself (parquet timestamp[ns] / [ms] -> session
TimestampType, microseconds, UTC session TZ).

At cluster scale these reads would point at a partitioned table layout
(e.g. dt= partitions) and the same code path applies: `spark.read.parquet`
over a directory prunes partitions from pushed-down filters.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# dims grow slowly or are fixed-size); fact tables shuffle on join keys.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def _ts_unit(path: str) -> str:
    """Timestamp unit of the ``ts`` column from the parquet footer ('ns',
    'us', ...). Footer-only read; a directory of part files checks one."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = [p for p in os.listdir(path) if p.endswith(".parquet")]
        if not parts:
            return "us"
        path = os.path.join(path, parts[0])
    field = pq.read_schema(path).field("ts")
    return getattr(field.type, "unit", "us")


@dataclass
class Catalog:
    """Lazy per-sf-dir table access: ``cat.lineitem``, ``cat["orders"]``."""

    spark: SparkSession
    sf_dir: str
    _cache: dict = field(default_factory=dict)

    def __getitem__(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
        if name not in self._cache:
            self._cache[name] = self._load(name)
        return self._cache[name]

    def _load(self, name: str) -> DataFrame:
        if name == "events" and _ts_unit(f"{self.sf_dir}/events.parquet") == "ns":
            # events.ts as parquet TIMESTAMP(NANOS) is refused by Spark's
            # vectorized reader. Read it as raw nanos and truncate to
            # micros — the exact same truncation DuckDB applies reading
            # the file, so oracle comparisons agree (FIXTURES.md:
            # "normalize on load"). Datasets written with micros (the
            # common case) take the plain path below.
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            from pyspark.sql import functions as F

            df = self.spark.read.parquet(f"{self.sf_dir}/events.parquet")
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_") or name in ("spark", "sf_dir"):
            raise AttributeError(name)
        try:
            return self[name]
        except KeyError as exc:  # pragma: no cover
            raise AttributeError(name) from exc

    def register_views(self) -> None:
        """Register every table as a temp view (for spark.sql operators)."""
        for name in TABLE_NAMES:
            self[name].createOrReplaceTempView(name)


def _ensure_package_shipped(spark: SparkSession) -> None:
    """Ship awsbeats_spark to executor Python workers via addPyFile.

    Functions sent to workers (mapInPandas decoders, foreachPartition
    sink writers) are pickled BY REFERENCE to this package; a driver
    running from an arbitrary cwd (the harness) gives workers no import
    path to it. Zipping the package once per process and registering it
    with addPyFile makes every worker able to import it, local or
    cluster mode alike.
    """
    sc = spark.sparkContext
    if getattr(sc, "_awsbeats_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), f"awsbeats_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "awsbeats_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._awsbeats_pkg_shipped = True


def tables(spark: SparkSession, sf_dir: str) -> Catalog:
    # The DuckDB oracle reads parquet timestamps as UTC-naive; pin the
    # session TZ so date/window functions agree even when the engine runs
    # under a driver-created session on a non-UTC host.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # InferFiltersFromGenerate infers `size(expr)>0` filters from
    # explode() and pushes them into the scan — when the generator input
    # is an expensive expression (the shingle pipeline) that re-evaluates
    # it per row at the scan AND at the project (measured 2.5x slowdown
    # on dedup_ngram_jaccard). The inferred filter only skips rows the
    # generator would drop anyway; excluding the rule is pure win here.
    # InferFiltersFromConstraints has the same failure mode one level up:
    # a null-intolerant filter over a derived column (jaccard >= t over
    # n = size(shingles(text))) infers isnotnull(n) and pushes the WHOLE
    # derived expression tree into the scan filter, re-evaluating the
    # shingle pipeline twice per row (measured 3.5x on dedup_ngram_jaccard
    # at sf0.1). The inferred isnotnull filters only help when join/filter
    # key columns actually contain nulls, which none of the engine's
    # workloads do — excluding it keeps scans single-evaluation.
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate,"
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints",
    )
    _ensure_package_shipped(spark)
    return Catalog(spark, sf_dir)
