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


def maintain_join_mv(
    v_old: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    da: DataFrame,
    db: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental INNER-JOIN view maintenance under append-only deltas
    — the classic delta rule (Blakeley et al. 1986; Δ(A ⋈ B) =
    ΔA ⋈ B' ∪ A ⋈ ΔB, with B' = B ∪ ΔB so the ΔA ⋈ ΔB cross term is
    counted exactly once):

        V' = V ∪ (ΔA ⋈ (B ∪ ΔB)) ∪ (A ⋈ ΔB)

    Inputs are the stored view, both base relations AS OF the previous
    refresh, and the two insert batches; output is the refreshed view,
    column-order normalized to the old view's schema. Append-only is
    the engine's spine (watermark loads never update in place);
    update/delete maintenance needs multiset counts per row and is out
    of scope here.

    Scale: the refresh cost is O(|ΔA|·fanout + |ΔB|·fanout) — two
    joins whose PROBE sides are delta-sized (Catalyst broadcasts them
    unhinted while they fit; at larger deltas they degrade to shuffle
    joins on the same keys) — plus the view append. The O(|A|·|B|)
    full recompute never runs; the A and B scans feed only
    delta-keyed joins, so at 100 TB a day's maintenance costs a day's
    rows times join fan-out, not the fact-table product.
    """
    b_new = b_old.unionByName(db)
    leg_a = da.join(b_new, on)
    leg_b = a_old.join(db, on)
    cols = v_old.columns
    return (
        v_old.unionByName(leg_a.select(*cols))
        .unionByName(leg_b.select(*cols))
    )


def maintain_agg_mv(
    mv: DataFrame,
    delta: DataFrame,
    keys: list[str],
    cnt_col: str = "n_events",
    sum_col: str = "sum_v",
    sign_col: str = "__sign",
    val_col: str = "__v",
) -> DataFrame:
    """Incremental maintenance of a COUNT/SUM aggregate view under a
    signed delta stream (+1 inserts, -1 deletes): the new view is the
    old view full-outer-merged with the delta's per-key (sum(sign),
    sum(sign*v)); keys whose maintained count reaches zero disappear,
    exactly as a recompute would drop them. COUNT and SUM are the
    SELF-MAINTAINABLE aggregates (Gupta & Mumick's taxonomy) — they
    absorb deletions from the aggregate alone; MIN/MAX under deletes
    need the base table and are deliberately out of this operator's
    contract.

    100 TB: the view is group-cardinality-sized; the refresh touches
    the DELTA (one map-combined per-key rollup) plus one
    view-vs-delta outer merge keyed on the group — never the loaded
    history. This is why warehouses keep additive rollups
    incrementally and schedule recomputes only for non-maintainable
    aggregates."""
    d = delta.groupBy(*keys).agg(
        F.sum(F.col(sign_col)).cast("bigint").alias("__dc"),
        F.sum(F.col(sign_col) * F.col(val_col)).cast("bigint").alias("__dv"),
    )
    merged = mv.join(d, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(F.col(cnt_col), F.lit(0))
            + F.coalesce(F.col("__dc"), F.lit(0))
        ).cast("bigint").alias(cnt_col),
        (
            F.coalesce(F.col(sum_col), F.lit(0))
            + F.coalesce(F.col("__dv"), F.lit(0))
        ).cast("bigint").alias(sum_col),
    )
    return merged.filter(F.col(cnt_col) > 0)
