"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only state is the per-batch retry set (SURVEY.md A6);
this generalizes to arbitrary keyed state across micro-batches — the
engine's escape hatch for operators neither windowed aggregation nor
dropDuplicates can express (running counters, custom sessionization,
fraud-style accumulators).

Scale: state lives in the state store partitioned by the group key —
the same hash partitioning as any keyed aggregation, checkpointed per
epoch; state size is bounded by keys, not events.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Accumulate per-user event count + value sum across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events (user_id, value, ...) -> stream of updated per-user
    running totals, one row per user per micro-batch touched."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x): the full stateful-processor API
# (named state variables, TTL, timers) — the successor to
# applyInPandasWithState above. Same engine semantics, richer lifecycle.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - availability gate
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # TWS runs a protobuf-based state server between the JVM and the
    # Python worker; without google.protobuf the worker crashes at init,
    # so the gate checks BOTH the API and its transport dependency.
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS = True
except ImportError:  # older Spark, or protobuf not installed
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False


class UserTotalsProcessor(StatefulProcessor):
    """Per-user running totals as a TWS StatefulProcessor: one ValueState
    holding (n, total), updated per micro-batch — the reference's
    retry-set-per-batch state generalized exactly as in
    running_user_totals, but on the API that also offers timers and TTL
    for eviction at scale."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState("totals", "n long, total double")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, total = self._state.get() if self._state.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """TWS twin of running_user_totals (requires Spark 4.x)."""
    if not HAS_TWS:
        raise NotImplementedError("transformWithStateInPandas requires Spark 4.x")
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
