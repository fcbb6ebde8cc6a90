"""[EXT] Incremental materialized-view maintenance for ADDITIVE
aggregates — the composition the engine's incremental spine exists
for: instead of re-aggregating the whole fact table nightly, aggregate
only the watermark DELTA and merge it into the stored view by
addition.

Additive measures (sum, count) merge exactly: the refreshed view is
``old ⟗ partial(delta)`` with measure = old + delta per group — a
full-outer join on the group keys where either side may be absent (a
brand-new group arrives, an old group sees no delta). Non-additive
measures (min/max are semi-additive and merge with greatest/least;
avg must be stored as sum+count) are the caller's decomposition job —
this operator takes the merge function per measure.

Scale: the refresh cost is O(delta) + O(|view|) — the view is
GROUP-cardinality sized (small next to the facts), the delta partial
map-combines before its shuffle, and the rewrite uses the same
rename-aside crash-safe swap as :func:`..sources.maintenance.compact`
(at every instant the path or the aside holds a complete copy; a
previous crash is recovered on entry). At 100 TB this turns the
nightly groupBy-over-everything into a groupBy over one day.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: measure spec: out_col -> (merge fn name, aggregate Column builder)
_MERGES = {
    "add": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "max": lambda a, b: F.greatest(a, b),
    "min": lambda a, b: F.least(a, b),
}


def _aggregate(df: DataFrame, keys: list[str], measures: dict) -> DataFrame:
    return df.groupBy(*keys).agg(
        *[expr.alias(name) for name, (_, expr) in measures.items()]
    )


def build_additive_mv(
    df: DataFrame, path: str, keys: list[str], measures: dict
) -> None:
    """Initial materialization: aggregate and write. ``measures`` maps
    output column -> (merge, aggregate expression) where merge is
    'add' (sum/count), 'max', or 'min'."""
    bad = [m for m, (mg, _) in measures.items() if mg not in _MERGES]
    if bad:
        raise ValueError(f"unsupported merge for measures {bad}")
    _aggregate(df, keys, measures).write.mode("overwrite").parquet(path)


def refresh_additive_mv(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    measures: dict,
    extra_files: dict[str, str] | None = None,
) -> None:
    """Merge the DELTA's partial aggregate into the stored view —
    cost O(delta) + O(groups), never O(facts). Crash-safe swap
    mirroring ``maintenance.compact`` (dot-prefixed temp + aside,
    recovery on entry). ``extra_files`` (name → content) are written
    INTO the temp directory before the swap, so they become visible
    atomically WITH the refreshed data — the streaming epoch fence
    rides here: fence and view can never disagree across a crash."""
    path = path.rstrip("/")
    parent, base = os.path.split(path)
    tmp = os.path.join(parent, f".{base}__refreshing")
    old = os.path.join(parent, f".{base}__old")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)

    cur = spark.read.parquet(path)
    # delta measures renamed pre-join; the USING-style full outer then
    # coalesces the key columns itself and both measure sets coexist
    part = _aggregate(delta, keys, measures).select(
        *keys,
        *[F.col(n).alias(f"__d_{n}") for n in measures],
    )
    merged = cur.join(part, keys, "full_outer").select(
        *keys,
        *[
            _MERGES[mg](F.col(name), F.col(f"__d_{name}")).alias(name)
            for name, (mg, _) in measures.items()
        ],
    )
    merged.write.mode("overwrite").parquet(tmp)
    for name, content in (extra_files or {}).items():
        with open(os.path.join(tmp, name), "w") as f:
            f.write(content)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    assert glob.glob(os.path.join(path, "*.parquet")), "refresh produced no files"
