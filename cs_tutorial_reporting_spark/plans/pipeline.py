"""The reference's three pipelines (EP1-EP3, SURVEY.md §3) as one lazy
DataFrame chain each.

Reference shape (per TaskGroup, reporting_dag.py:50-180):

    extract (REST, watermark param) → JSON landing (GCS) → list objects
    → project schema_fields → CSV → PK filter → COPY append

Engine shape (every ``>>`` process boundary deleted):

    read(source) → project_cast → incremental_filter(> watermark)
    → dedup_against(existing PKs) → write append

XCom disappears (the watermark is a plain Python scalar from
``watermark()``); the landing zone is an optional ``write_json_landing``
tap; the CSV hop is gone. Catalyst does parse→analyze→optimize→physical;
the only process boundaries left are Spark's own task dispatch/shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..operators.incremental import (
    dedup_against,
    dedup_within,
    incremental_filter,
    watermark,
)
from ..operators.project import project_cast


@dataclass
class LoadResult:
    """What one pipeline run did — returned instead of Airflow task logs."""

    loaded: DataFrame
    watermark_used: object | None = None
    stats: dict = field(default_factory=dict)


def incremental_load(
    incoming: DataFrame,
    existing: DataFrame | None,
    schema: T.StructType,
    pk_cols: list[str] | None = None,
    watermark_col: str | None = None,
) -> LoadResult:
    """EP1-EP3 unified: project+cast, watermark-filter, PK-dedup.

    - EP1 (``dags`` group): ``pk_cols=['dag_id']``, no watermark —
      full-extract + dedup (reporting_dag.py:50-81 intended semantics).
    - EP2 (``dag_runs``): composite PK + ``watermark_col='start_date'``
      (reporting_dag.py:82-123).
    - EP3 (``task_instances``): no PK (append-only) +
      ``watermark_col='start_date'`` (reporting_dag.py:124-176).

    Returns the deduped delta ready for ``sinks.write_table_append`` —
    the caller owns the write so tests/driver can inspect the plan.
    """
    df = project_cast(incoming, schema, strict=True)
    wm = None
    if watermark_col is not None and existing is not None:
        wm = watermark(existing, watermark_col)
        df = incremental_filter(df, watermark_col, wm)
    if pk_cols:
        df = dedup_within(df, pk_cols)
        if existing is not None:
            df = dedup_against(df, existing, pk_cols)
    return LoadResult(loaded=df, watermark_used=wm)


def load_report_table(
    incoming: DataFrame,
    existing: DataFrame | None,
    table: str,
) -> LoadResult:
    """Catalog-driven wrapper: look up schema/PK/watermark config for one
    of the reference's three reporting tables (schemas.RPT_TABLES)."""
    from ..schemas import PRIMARY_KEYS, RPT_TABLES, WATERMARK_COLUMNS

    return incremental_load(
        incoming,
        existing,
        RPT_TABLES[table],
        pk_cols=PRIMARY_KEYS.get(table) or None,
        watermark_col=WATERMARK_COLUMNS.get(table),
    )
