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
    'us', ...). Footer-only read; a directory (including a partitioned
    dt=... layout) probes the first part file found recursively. Remote
    URIs (s3://, hdfs://) that local pyarrow I/O can't open fall back to
    'ns' — the prior behavior — so the legacy-nanos read path (which also
    handles micros correctly after the cast in _load) is taken rather
    than raising before Spark ever reads the data."""
    import pyarrow.parquet as pq

    try:
        if os.path.isdir(path):
            # per-level sorted walk with early return: deterministic AND
            # O(first partition) — sorted(os.walk(...)) would list the
            # entire tree before yielding anything, which on a
            # thousands-of-partitions layout makes the "footer-only
            # probe" a full driver-side listing
            part = None
            for root, dirs, files in os.walk(path):
                dirs.sort()
                cand = sorted(f for f in files if f.endswith(".parquet"))
                if cand:
                    part = os.path.join(root, cand[0])
                    break
            if part is None:
                return "ns"
            path = part
        field = pq.read_schema(path).field("ts")
        return getattr(field.type, "unit", "us")
    except (OSError, KeyError, ValueError):
        return "ns"


# Process-wide LAZY DataFrame reuse: keyed on (Spark application id,
# path, mtime, size). A DataFrame is an unexecuted plan — re-resolving
# the same parquet relation on every operator invocation re-lists the
# files and re-reads the footer schema on the DRIVER (measured 140-280
# ms per spark.read.parquet call vs 25-55 ms with a known schema), pure
# metadata overhead repaid on every one of the bench's per-query runs.
# This caches NO data and NO results: every action on the returned
# DataFrame still scans the parquet from disk (it is exactly the plan
# a metastore/Iceberg catalog would hand out without re-listing — the
# guide §6 argument). The mtime+size key drops the entry if the file
# changes; the applicationId key drops it if the SparkContext restarts.
_RELATION_CACHE: dict[tuple, DataFrame] = {}


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
            self._cache[name] = self._load_cached(name)
        return self._cache[name]

    def _load_cached(self, name: str) -> DataFrame:
        path = f"{self.sf_dir}/{name}.parquet"
        try:
            st = os.stat(path)
            key = (
                self.spark.sparkContext.applicationId,
                os.path.abspath(path),
                st.st_mtime_ns,
                st.st_size,
            )
        except OSError:
            return self._load(name)
        if key not in _RELATION_CACHE:
            # bound the plan cache: test suites create many throwaway
            # sf dirs/sessions; the steady state is #tables x #sf_dirs
            if len(_RELATION_CACHE) > 256:
                _RELATION_CACHE.clear()
            _RELATION_CACHE[key] = self._load(name)
        return _RELATION_CACHE[key]

    def _load(self, name: str) -> DataFrame:
        path = f"{self.sf_dir}/{name}.parquet"
        if name != "events":
            return self.spark.read.parquet(path)
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampType

        if _ts_unit(path) == "ns":
            # events.ts as parquet TIMESTAMP(NANOS) is refused by Spark's
            # vectorized reader; the legacy flag reads it as raw nanos.
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self.spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # Raw nanos under the legacy flag: truncate to micros — the
            # exact truncation DuckDB applies reading the file, so oracle
            # comparisons agree (FIXTURES.md: "normalize on load").
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if not isinstance(ts_type, TimestampType):
            # Micros/millis data with no timezone in the footer loads as
            # TIMESTAMP_NTZ, which breaks unix_micros()/double casts
            # downstream. The session TZ is pinned UTC (tables() below),
            # so NTZ -> session TimestampType is value-identical and the
            # DuckDB naive-timestamp oracle still agrees.
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df

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


def _input_bytes(path: str) -> int | None:
    """Total on-disk bytes of a parquet file/dir; None when not local."""
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if not os.path.isdir(path):
            # remote URI / missing path: size is UNKNOWN, not zero — a
            # 0 here would let the fan-out repartition fire on a huge
            # remote table, the exact failure the gate exists to prevent
            return None
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.endswith(".parquet")
            )
        return total
    except OSError:
        return None


# Absolute ceiling for the fan-out repartition: shuffling this much is
# trivial on any hardware, and a corpus past it produces enough scan
# splits on its own. Keeps the helper a guaranteed no-op at data scale.
_FANOUT_MAX_BYTES = 256 * 1024 * 1024


def scan_fanout(
    df: DataFrame, sf_dir: str, table: str, min_rows: int | None = None
) -> DataFrame:
    """Spread a small unsplittable scan across the host's cores.

    Parquet scan parallelism comes from size/maxPartitionBytes splits
    (row-group granularity), so a small single-file table is ONE task —
    and every CPU-heavy per-row pipeline above it (tokenize, shingle,
    md5, cosine) serializes on one core until the first exchange. The
    guide's remedy for unsplittable inputs is repartition-after-read
    (§2.5); this applies it ONLY when it is provably the bench-scale
    case: input under 256 MB AND fewer estimated splits than cores. At
    cluster scale the scan produces >= cores splits and this returns the
    DataFrame unchanged — the repartition can never fire on big data.

    ``min_rows`` additionally gates on the table's footer row count for
    callers whose per-row work is CHEAP: the exchange + N-task Python
    dispatch costs ~0.2 s locally, so fanning out pays only when the
    serial per-row work exceeds it (round 12: multimodal_decode's
    measured decode is ~11 us/row — fan-out at 5k rows costs 0.23 s to
    save 0.05 s, measured 0.56 vs 0.33 s; at 50k rows it saves, 0.75 vs
    0.81 s). Callers pass the row count where their measured per-row
    cost crosses the exchange overhead; None keeps the pure size gate.

    Round-robin repartition changes physical row order, so callers must
    be order-insensitive (exact mins/counts/per-row maps — NOT raw
    double sums, whose accumulation order would drift vs the oracle).
    """
    spark = df.sparkSession
    size = _input_bytes(f"{sf_dir}/{table}.parquet")
    if size is None or size > _FANOUT_MAX_BYTES:
        return df
    if min_rows is not None:
        rows = _input_rows(f"{sf_dir}/{table}.parquet")
        if rows is not None and rows < min_rows:
            return df
    cores = spark.sparkContext.defaultParallelism
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "b": 1}
    raw = raw.strip().lower().removesuffix("b")
    max_split = (
        int(raw[:-1]) * units[raw[-1]] if raw and raw[-1] in units else int(raw or 0) or 134217728
    )
    est_splits = max(1, size // max_split)
    if est_splits >= cores:
        return df
    return df.repartition(cores)


def _input_rows(path: str) -> int | None:
    """Row count from parquet footers (file or dir); None when not local.
    Footer-only reads — no data pages touched."""
    import pyarrow.parquet as pq

    try:
        if os.path.isfile(path):
            return pq.read_metadata(path).num_rows
        if not os.path.isdir(path):
            return None
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                pq.read_metadata(os.path.join(root, f)).num_rows
                for f in files
                if f.endswith(".parquet")
            )
        return total
    except (OSError, ValueError):
        return None


# Calibration for pair_repartition (measured on this corpus family,
# round 12): 5,000 docs -> 1.13M candidate pairs; 50,000 docs -> 113.4M
# pairs — quadratic growth, because each duplicate cluster appears once
# per corpus replica so common-shingle doc frequencies scale with corpus
# size. 110k pair-groups per partition keeps the final aggregate's hash
# map ≈ 9 MB — inside the ~13 MB per-task execution share of a DEFAULT
# 1 GB / 32-thread session (guide §5), i.e. no spill storm even with no
# engine tuning. Probed: width 512 OOMs a bare session at 50k docs,
# 1024 completes clean; the formula gives 1027 there.
_PAIRS_AT_CAL = 1_130_000
_CAL_ROWS = 5_000
_PAIRS_PER_PARTITION = 110_000
_PAIR_WIDTH_CAP = 4096


def pair_repartition(df: DataFrame, sf_dir: str, table: str, *cols: str) -> DataFrame:
    """Hash-repartition a candidate-PAIR relation (the output of a
    shared-key self-join) by ``cols``, with the exchange width derived
    from the source table's row count (guide §2.5 "derive from input
    size" — here the driving quantity is the QUADRATIC pair volume, so
    bytes-proportional sizing such as AQE's advisory-size coalescing
    under-partitions it: 64 MB of shuffled pair rows deserialize into
    ~500 MB of aggregate hash-map state).

    Width also matters on the WRITE side: under the bypass shuffle
    writer (<= spark.shuffle.sort.bypassMergeThreshold reduce
    partitions) every map task holds one serializer+compression buffer
    PER reduce partition (~100 KB); a default session's 200 partitions x
    32 local tasks pins ~600 MB of untracked heap — the other half of
    the measured sf1-replica OOM. The quadratic width lands either at
    cores (bench scale, tiny buffers) or beyond the bypass threshold
    (tracked, spillable sort writer), skipping the bad middle.

    Past the ``scan_fanout`` size gate the column-only repartition is
    kept: a production session sizes spark.sql.shuffle.partitions for
    the cluster and AQE owns coalesce/skew from there.
    SPARK_GRAFT_PAIR_WIDTH overrides for probes/production tuning.
    """
    spark = df.sparkSession
    size = _input_bytes(f"{sf_dir}/{table}.parquet")
    if size is not None and size <= _FANOUT_MAX_BYTES:
        width = int(os.environ.get("SPARK_GRAFT_PAIR_WIDTH", "0"))
        if not width:
            rows = _input_rows(f"{sf_dir}/{table}.parquet")
            est_pairs = _PAIRS_AT_CAL * ((rows or 0) / _CAL_ROWS) ** 2
            width = min(
                _PAIR_WIDTH_CAP,
                max(
                    spark.sparkContext.defaultParallelism,
                    -(-int(est_pairs) // _PAIRS_PER_PARTITION),
                ),
            )
        return df.repartition(width, *cols)
    return df.repartition(*cols)


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
