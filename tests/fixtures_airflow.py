"""Family-A fixtures (FIXTURES.md §A): deterministic Airflow-metadata
batches for reference-parity pipeline tests. Two batches per table —
``initial`` and ``increment`` — with the required edge cases: NULL
start_date, a boundary row exactly at the initial max (must be excluded
by strict >), duplicate PKs across batches, empty-string fields, and a
boolean that round-tripped through ``str()`` (airflow_to_gcs.py:143).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(hours: float) -> dt.datetime:
    return T0 + dt.timedelta(hours=hours)


def dag_batches(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """rpt_dag — no watermark; PK dedup on dag_id (EP1).

    The increment re-extracts every DAG (full extract each run) plus one
    new DAG — only the new one should load. Booleans arrive as 'True'/
    'False' strings, mirroring the reference's str() quirk.
    """
    cols = (
        "dag_id string, is_paused string, is_subdag string, is_active string, "
        "fileloc string, file_token string, owners string, description string, "
        "root_dag_id string, schedule_interval string"
    )
    initial = spark.createDataFrame(
        [
            ("etl_a", "True", "False", "True", "/dags/a.py", "tokA", "alice", "desc a", None, "@daily"),
            ("etl_b", "False", "False", "True", "/dags/b.py", "tokB", "bob", "", None, None),
        ],
        cols,
    )
    increment = spark.createDataFrame(
        [
            ("etl_a", "True", "False", "True", "/dags/a.py", "tokA", "alice", "desc a", None, "@daily"),
            ("etl_b", "False", "False", "False", "/dags/b.py", "tokB", "bob", "", None, None),
            ("etl_c", "False", "False", "True", "/dags/c.py", "tokC", "carol", "new dag", None, "0 * * * *"),
        ],
        cols,
    )
    return initial, increment


def dag_run_batches(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """rpt_dag_run — composite PK (dag_run_id, dag_id) + start_date
    watermark (EP2). Initial max start_date = ts(2).

    Increment contains: a boundary row exactly AT ts(2) (excluded by
    strict >), a composite-PK duplicate after the watermark (excluded by
    anti-join), a same-run_id-different-dag row (kept), and a NULL
    start_date row (excluded by watermark comparison — NULL > x is NULL).
    """
    cols = (
        "dag_id string, dag_run_id string, end_date timestamp, "
        "execution_date timestamp, external_trigger string, "
        "logical_date timestamp, start_date timestamp, state string"
    )
    initial = spark.createDataFrame(
        [
            ("etl_a", "run1", ts(1.5), ts(1), "False", ts(1), ts(1), "success"),
            ("etl_a", "run2", None, ts(2), "True", ts(2), ts(2), "running"),
        ],
        cols,
    )
    increment = spark.createDataFrame(
        [
            # boundary: exactly at watermark → excluded
            ("etl_a", "run2b", None, ts(2), "False", ts(2), ts(2), "running"),
            # past watermark, new key → loaded
            ("etl_a", "run3", ts(4), ts(3), "False", ts(3), ts(3), "success"),
            # past watermark but PK already exists (re-extracted run2 that
            # finished later) → rejected by anti-join
            ("etl_a", "run2", ts(3.5), ts(2), "True", ts(2), ts(2.5), "success"),
            # same run_id as run1 but different dag → composite key is new
            ("etl_b", "run1", ts(5), ts(4.5), "False", ts(4.5), ts(4.5), "failed"),
            # NULL start_date → never passes the watermark filter
            ("etl_b", "runN", None, ts(4), "False", ts(4), None, "queued"),
        ],
        cols,
    )
    return initial, increment


def task_instance_batches(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """rpt_task_instance — append-only (no PK), start_date watermark (EP3)."""
    cols = (
        "dag_id string, task_id string, execution_date timestamp, "
        "start_date timestamp, end_date timestamp, duration double, "
        "state string, try_number int, max_tries int, hostname string, "
        "unixname string, pool string, pool_slots int, queue string, "
        "priority_weight int, operator string, queued_when timestamp, "
        "pid int, executor_config binary"
    )
    initial = spark.createDataFrame(
        [
            ("etl_a", "extract", ts(1), ts(1), ts(1.2), 720.0, "success", 1, 3,
             "h1", "airflow", "default_pool", 1, "default", 1, "PythonOperator",
             ts(0.9), 101, bytearray(b"\x80\x04")),
            ("etl_a", "load", ts(1), ts(1.3), ts(1.4), 360.0, "success", 1, 3,
             "h1", "airflow", "default_pool", 1, "default", 1, "PythonOperator",
             ts(1.2), 102, None),
        ],
        cols,
    )
    increment = spark.createDataFrame(
        [
            # duplicate of (etl_a, extract) after watermark — append table
            # keeps it (no PK, rpt.sql:58-62 commented out)
            ("etl_a", "extract", ts(2), ts(2), ts(2.2), 700.0, "success", 1, 3,
             "h2", "airflow", "default_pool", 1, "default", 1, "PythonOperator",
             ts(1.9), 201, None),
            # boundary at initial max ts(1.3) → excluded
            ("etl_a", "probe", ts(1.3), ts(1.3), None, None, "running", 1, 3,
             "h2", "airflow", "default_pool", 1, "default", 1, "BashOperator",
             None, 202, None),
        ],
        cols,
    )
    return initial, increment
