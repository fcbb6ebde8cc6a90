"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cs_tutorial_reporting_spark``; this module is
a thin adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The EP2 incremental-load pattern (SURVEY.md §7.2): watermark over the
    already-loaded split of ``orders``, strict-> incremental filter,
    anti-join dedup, grouped load report.
    """
    from cs_tutorial_reporting_spark.queries import QUERIES

    return QUERIES["incremental_watermark_load"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from cs_tutorial_reporting_spark.queries import QUERIES

    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    from cs_tutorial_reporting_spark.queries import QUERIES

    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
