"""SparkSession factory tuned for this engine.

Local-mode settings are chosen for the driver's harness (local[N] on one
host) but every knob documents its cluster-scale rationale so the same
code runs on a 1000-executor cluster by swapping the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "awsbeats-spark", cpus: str | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Scale rationale:
    * AQE on — runtime coalescing of small shuffle partitions and skew-join
      splitting are essential at 100 TB where static partition counts are
      always wrong for some stage.
    * shuffle.partitions — sized to cores locally; on a real cluster AQE's
      coalescing makes the initial number a ceiling, not a target.
    * Arrow on — all pandas_udf / toPandas paths batch through Arrow.
    * Session TZ pinned UTC — oracle (DuckDB) timestamps are UTC-naive.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    # Shuffle/spill scratch dir. This host's ext4-on-virtio /tmp costs
    # ~1.4 ms per small shuffle-block write (measured: 40x slower than
    # tmpfs), and shuffle WRITE time — not bytes — dominated the heavy
    # tokenize stages (11 s of a 23 s stage for 5.7 MB of output). The
    # guide's §2.1 warning that slow local disks can be the tighter
    # shuffle limit applies verbatim, so local runs default the scratch
    # to RAM-backed /dev/shm. On a production cluster this must be a
    # fast local SSD/NVMe array instead (shuffle data at 100 TB cannot
    # live in RAM): set SPARK_GRAFT_LOCAL_DIR, or leave Spark's default
    # which inherits the cluster manager's disk allocation.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/awsbeats-spark-local"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # let Python DataSources (sources/python_ds.py) receive pushed filters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", mem)
        .config("spark.ui.enabled", "false")
        # keep stage progress bars out of stdout: the driver parses
        # bench.py's one-line JSON payload and records the tail verbatim
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
