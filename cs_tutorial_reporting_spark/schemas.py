"""Explicit StructType catalog.

Two schema families (FIXTURES.md):

A. The reference's reporting tables, transcribed from the DDL at
   ``/root/reference/include/sql/rpt.sql:6-63`` and the extraction field
   lists at ``/root/reference/dags/reporting_dag.py:68-79,107-116,149-169``.
   Postgres→Spark type mapping per SURVEY.md §1.4 (varchar/text→string,
   timestamptz→timestamp with UTC session tz, bytea→binary).

B. The driver star schema + extension tables materialized at
   ``/root/testdata/sf*/``.

No schema inference anywhere — every reader takes one of these.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(*fields: tuple[str, T.DataType, bool]) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


# --- A. reference reporting tables (rpt.sql) -------------------------------

#: rpt.dag (rpt.sql:6-19) — PK dag_id (engine-enforced via anti-join dedup).
RPT_DAG = _struct(
    ("dag_id", T.StringType(), False),
    ("is_paused", T.BooleanType(), True),
    ("is_subdag", T.BooleanType(), True),
    ("is_active", T.BooleanType(), True),
    ("fileloc", T.StringType(), True),
    ("file_token", T.StringType(), True),
    ("owners", T.StringType(), True),
    ("description", T.StringType(), True),
    ("root_dag_id", T.StringType(), True),
    ("schedule_interval", T.StringType(), True),
)

#: rpt.dag_run (rpt.sql:21-35) — PK (dag_run_id, dag_id); start_date is the
#: incremental watermark column (reporting_dag.py:35).
RPT_DAG_RUN = _struct(
    ("dag_id", T.StringType(), False),
    ("dag_run_id", T.StringType(), False),
    ("end_date", T.TimestampType(), True),
    ("execution_date", T.TimestampType(), False),
    ("external_trigger", T.BooleanType(), True),
    ("logical_date", T.TimestampType(), False),
    ("start_date", T.TimestampType(), True),
    ("state", T.StringType(), True),
)

#: rpt.task_instance (rpt.sql:37-63) — append-only (PK commented out in the
#: reference DDL, rpt.sql:58-62); start_date watermark (reporting_dag.py:43).
RPT_TASK_INSTANCE = _struct(
    ("dag_id", T.StringType(), False),
    ("task_id", T.StringType(), False),
    ("execution_date", T.TimestampType(), True),
    ("start_date", T.TimestampType(), True),
    ("end_date", T.TimestampType(), True),
    ("duration", T.DoubleType(), True),
    ("state", T.StringType(), True),
    ("try_number", T.IntegerType(), True),
    ("max_tries", T.IntegerType(), True),
    ("hostname", T.StringType(), True),
    ("unixname", T.StringType(), True),
    ("pool", T.StringType(), False),
    ("pool_slots", T.IntegerType(), True),
    ("queue", T.StringType(), True),
    ("priority_weight", T.IntegerType(), True),
    ("operator", T.StringType(), True),
    ("queued_when", T.TimestampType(), True),
    ("pid", T.IntegerType(), True),
    ("executor_config", T.BinaryType(), True),
)

#: PK columns per reference table — drives anti-join dedup (rpt.sql:18,32)
#: and the intended-but-buggy pk wiring (reporting_dag.py:67, SURVEY §0).
PRIMARY_KEYS: dict[str, list[str]] = {
    "rpt_dag": ["dag_id"],
    "rpt_dag_run": ["dag_run_id", "dag_id"],
    "rpt_task_instance": [],  # append-only
}

#: Watermark column per incrementally-extracted entity
#: (reporting_dag.py:31-45).
WATERMARK_COLUMNS: dict[str, str] = {
    "rpt_dag_run": "start_date",
    "rpt_task_instance": "start_date",
}

RPT_TABLES: dict[str, T.StructType] = {
    "rpt_dag": RPT_DAG,
    "rpt_dag_run": RPT_DAG_RUN,
    "rpt_task_instance": RPT_TASK_INSTANCE,
}


# --- B. driver star schema (TESTDATA.md / FIXTURES.md §B) ------------------

REGION = _struct(
    ("r_regionkey", T.IntegerType(), True),
    ("r_name", T.StringType(), True),
)

NATION = _struct(
    ("n_nationkey", T.IntegerType(), True),
    ("n_name", T.StringType(), True),
    ("n_regionkey", T.IntegerType(), True),
)

CUSTOMER = _struct(
    ("c_custkey", T.LongType(), True),
    ("c_name", T.StringType(), True),
    ("c_nationkey", T.IntegerType(), True),
    ("c_acctbal", T.DoubleType(), True),
    ("c_mktsegment", T.StringType(), True),
)

SUPPLIER = _struct(
    ("s_suppkey", T.LongType(), True),
    ("s_name", T.StringType(), True),
    ("s_nationkey", T.IntegerType(), True),
    ("s_acctbal", T.DoubleType(), True),
)

PART = _struct(
    ("p_partkey", T.LongType(), True),
    ("p_name", T.StringType(), True),
    ("p_brand", T.StringType(), True),
    ("p_type", T.StringType(), True),
    ("p_size", T.IntegerType(), True),
    ("p_retailprice", T.DoubleType(), True),
)

ORDERS = _struct(
    ("o_orderkey", T.LongType(), True),
    ("o_custkey", T.LongType(), True),
    ("o_orderstatus", T.StringType(), True),
    ("o_totalprice", T.DoubleType(), True),
    ("o_orderdate", T.TimestampType(), True),
    ("o_orderpriority", T.StringType(), True),
)

LINEITEM = _struct(
    ("l_orderkey", T.LongType(), True),
    ("l_partkey", T.LongType(), True),
    ("l_suppkey", T.LongType(), True),
    ("l_linenumber", T.IntegerType(), True),
    ("l_quantity", T.DoubleType(), True),
    ("l_extendedprice", T.DoubleType(), True),
    ("l_discount", T.DoubleType(), True),
    ("l_tax", T.DoubleType(), True),
    ("l_returnflag", T.StringType(), True),
    ("l_linestatus", T.StringType(), True),
    ("l_shipdate", T.TimestampType(), True),
)

EVENTS = _struct(
    ("event_id", T.LongType(), True),
    ("ts", T.TimestampType(), True),  # parquet ns → Spark µs truncation
    ("user_id", T.LongType(), True),
    ("event_type", T.StringType(), True),
    ("value", T.DoubleType(), True),
    ("props", T.StringType(), True),  # JSON-encoded string
)

#: Schema of events.props once parsed (from_json) — observed payload shape
#: is ``{"k": <int>}``.
EVENT_PROPS = _struct(("k", T.LongType(), True))

DOCUMENTS = _struct(
    ("doc_id", T.LongType(), True),
    ("text", T.StringType(), True),
    ("lang", T.StringType(), True),
    ("source", T.StringType(), True),
    ("n_chars", T.LongType(), True),
)

EMBEDDINGS = _struct(
    ("vec_id", T.LongType(), True),
    ("embedding", T.ArrayType(T.FloatType()), True),
    ("label", T.IntegerType(), True),
)

STAR_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
