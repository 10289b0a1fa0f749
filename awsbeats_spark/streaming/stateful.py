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
