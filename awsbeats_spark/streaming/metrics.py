"""Streaming observability: a StreamingQueryListener that materializes
per-micro-batch progress as a metrics table.

Engine twin of the reference's `outputs.Observer` counters
(NewBatch/Acked/Dropped — /root/reference/streams/client.go:87-96,
firehose/client.go:71-79): where the reference pushes counts into a
metrics registry per publish attempt, Structured Streaming emits a
progress event per micro-batch; this listener captures those events so
the pipeline's throughput is queryable like any other table.

Scale: listener callbacks run on the driver and receive only
already-aggregated per-batch numbers (rows, durations) — O(batches)
driver memory, nothing per-row, so it costs the same at 100 TB as in a
test.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

_SCHEMA = (
    "query_id string, batch_id long, num_input_rows long, "
    "input_rows_per_second double, batch_duration_ms long"
)


class PipelineMetricsListener(StreamingQueryListener):
    """Collects one row per micro-batch progress event (thread-safe —
    Spark delivers listener events from its own listener-bus thread)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.rows: list[tuple] = []

    # -- StreamingQueryListener interface ------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        with self._lock:
            self.rows.append(
                (
                    str(p.id),
                    p.batchId,
                    p.numInputRows,
                    float(p.inputRowsPerSecond or 0.0),
                    int(p.durationMs.get("triggerExecution", 0)),
                )
            )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- metrics surface ----------------------------------------------
    def snapshot(self) -> list[tuple]:
        with self._lock:
            return list(self.rows)

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        """The captured progress as a DataFrame (the `metrics` table of
        SURVEY.md §1.1 — query it like any other source)."""
        return spark.createDataFrame(self.snapshot(), _SCHEMA)

    def total_input_rows(self, query_id: str | None = None) -> int:
        return sum(
            r[2] for r in self.snapshot() if query_id is None or r[0] == query_id
        )
