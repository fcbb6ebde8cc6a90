"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` DuckDB
equivalent at a given sf dir and compares row-count, column names, and an
order-insensitive canonical value multiset. Run before every commit:

    python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import math
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip repr; collapse -0.0
        return repr(v + 0.0 if v != 0 else 0.0)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rowset(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as mod
    from cs_tutorial_reporting_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = mod.queries(), mod.oracle_sql()
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    failed = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"pass* {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            rel = con.sql(sql)
            dcols = list(rel.columns)
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            a, b = _rowset(scols, srows), _rowset(dcols, drows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"pass  {name} ({len(srows)} rows)")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} queries match at {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            set(sys.argv[2:]) or None,
        )
    )
