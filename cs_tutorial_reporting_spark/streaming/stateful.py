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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 typed-state API) — ENVIRONMENT-BLOCKED
# ---------------------------------------------------------------------------
# The successor API (SPARK-46815: typed state handles, timers, TTL) is
# wired below and is real, but its Python worker protocol imports
# google.protobuf (pyspark/sql/streaming/proto/StateMessage_pb2), which
# is NOT installed in this container and cannot be added (no pip).
# Probed 2026-08-14: the pre-init runner crashes with
# "ImportError: cannot import name 'descriptor' from 'google.protobuf'".
# The pytest below skips unless protobuf appears; applyInPandasWithState
# (above) remains the exercised arbitrary-state surface.

TWS_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value_e4 bigint, "
    "max_gap_ms bigint, last_ts_ms bigint"
)

_TWS_STATE_SCHEMA = "n bigint, sum_e4 bigint, max_gap bigint, last_ts bigint"


def _make_lifecycle_processor():
    """Factory for the typed-state processor (imports kept inside so the
    module loads without the streaming proto deps)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserLifecycleProcessor(StatefulProcessor):
        """Per-user lifecycle stats where ``max_gap_ms`` — the largest
        gap between CONSECUTIVE events — needs genuine cross-batch
        state (the previous batch's last-seen timestamp). Merge
        contract: batches arrive time-partitioned per user (append-only
        event-log invariant); within a batch rows are re-sorted, so
        only the boundary gap relies on it."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", _TWS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np
            import pandas as pd

            df = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            ts_ms = (
                df["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
            ).to_numpy()
            e4 = np.floor(df["value"].to_numpy() * 10000.0 + 0.5).astype("int64")
            n, sum_e4, max_gap, last_ts = 0, 0, 0, None
            if self._stats.exists():
                n, sum_e4, max_gap, last_ts = self._stats.get()
            if last_ts is not None and len(ts_ms):
                max_gap = max(max_gap, int(ts_ms[0]) - int(last_ts))
            if len(ts_ms) > 1:
                max_gap = max(max_gap, int(np.diff(ts_ms).max()))
            n += len(df)
            sum_e4 += int(e4.sum())
            last_ts = int(ts_ms[-1]) if len(ts_ms) else last_ts
            self._stats.update((n, sum_e4, max_gap, last_ts))
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "n_events": [n],
                    "sum_value_e4": [sum_e4],
                    "max_gap_ms": [max_gap],
                    "last_ts_ms": [last_ts],
                }
            )

        def close(self) -> None:
            pass

    return UserLifecycleProcessor()


def user_lifecycle_state(events: DataFrame) -> DataFrame:
    """Typed-state lifecycle stats (transformWithStateInPandas;
    RocksDB-only per the API contract). Emits the RUNNING state per
    touched user each micro-batch; every emitted column is monotone
    non-decreasing under the time-partitioned-batch contract, so the
    final answer is the per-user max of each column regardless of
    batch slicing. State: one 4-int tuple per user, off-heap in
    RocksDB, sharded by the grouping key."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_lifecycle_processor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
