"""[EXT] Streaming twin of the reference's incremental load (EP2).

The reference re-extracts in batch behind a stored watermark and
anti-joins already-loaded PKs (SURVEY §3, operators/incremental.py).
Continuously, the same contract is: file-source stream over the landing
zone → event-time watermark → PK dedup within the watermark horizon →
append sink. ``dropDuplicatesWithinWatermark`` is the engine-managed
equivalent of the anti-join: state holds one entry per PK seen inside
the horizon and expires automatically, so state size is bounded by the
arrival window, not by table history — exactly the property that makes
this run forever at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def incremental_dedup_stream(
    stream: DataFrame,
    pk_cols: list[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """PK-deduplicated append stream: a row is dropped if a row with the
    same PK arrived within the watermark horizon (late duplicates beyond
    the horizon are the batch anti-join's job — the two compose)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        pk_cols
    )
