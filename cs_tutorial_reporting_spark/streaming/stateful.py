"""[EXT] Custom stateful streaming operators via ``applyInPandasWithState``.

``session_window``/``window`` (streaming/sessions.py) cover the declarative
stateful shapes; this module is the escape hatch for semantics Spark's
built-in state operators can't express — arbitrary per-key accumulators
updated per micro-batch with Arrow-vectorized Python and engine-managed,
checkpointable state (the Structured Streaming state store).

Scale posture: state is partitioned by the grouping key across executors
(one shuffle per micro-batch), each group's history is O(state size) not
O(events seen), and the Python boundary is Arrow-batched — the 100 TB
concern is state-store size per key, which these operators keep to a few
scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, max_value double"
RUNNING_STATE_SCHEMA = "n bigint, s double, mx double"


def _update_running(key, pdfs, state: GroupState):
    """Per-user lifetime accumulator: (count, sum, max) over all events
    seen so far, emitted once per micro-batch the key appears in."""
    import pandas as pd

    n, s, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, s, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [round(s, 2)],
            "max_value": [mx],
        }
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit engine-managed
    state. Each micro-batch emits the updated lifetime (count, sum, max)
    for every user present in the batch — the custom-stateful twin of a
    batch ``groupBy(user).agg(...)``, but incremental and restartable
    from the checkpointed state store."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
