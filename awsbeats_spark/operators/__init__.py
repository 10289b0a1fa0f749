"""Operator modules. Importing this package registers every operator
into ``awsbeats_spark.registry.QUERIES``.

Registration order is deliberate: the driver's correctness pass walks
``queries()`` in registration order under a budget, so modules that have
not yet received a driver-green row register FIRST (round-1 pass covered
only the first 50 keys — all from aggregates/extended/graph/joins/
pipeline, which therefore now register last).
"""

from awsbeats_spark.operators.llm import (  # noqa: F401
    corpus,
    dedup,
    multimodal,
    similarity,
    text,
)
from awsbeats_spark.operators import (  # noqa: F401
    quality,
    udtf,
    relational,
    windows,
    setops,
    sqlfuncs,
    streaming_batch,
    scale,
    profiling,
    timeseries,
    tpch_more,
    aggregates,
    extended,
    graph,
    joins,
    pipeline,
)
