"""r13 deletion-vector block rehearsal (SURVEY §16): the three DV
queries in ``queries_dv.py`` must match their DuckDB oracles at sf0.01
with the driver's exact canonicalization — every round this passes,
the r13 registration stays copy-paste. Values pinned from the r11
rehearsal: n_deleted 681, live counts 15000/14319/9544."""

from __future__ import annotations

import duckdb
import pytest

from cs_tutorial_reporting_spark.queries_dv import DV_BLOCK, DV_ORACLES

from tools.check_oracle import TABLES, _canon_frame

from .conftest import SF_ORACLE as SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", list(DV_BLOCK))
def test_dv_query_matches_oracle(spark, duck, name):
    spdf = DV_BLOCK[name](spark, SF_DIR).toPandas()
    ddf = duck.sql(DV_ORACLES[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(ddf.columns)
    assert len(spdf) == len(ddf)
    assert _canon_frame(spdf) == _canon_frame(ddf)


def test_dv_rehearsal_pins_r11_values(spark):
    """The frozen-design scalars from the r11 rehearsal at sf0.01 —
    a silent testdata or predicate drift would unfreeze the r13
    design without anyone noticing."""
    got = {
        (r["version"], r["n_live"])
        for r in DV_BLOCK["dv_chain_time_travel"](spark, SF_DIR).collect()
    }
    assert got == {(1, 15000), (2, 14319), (3, 9544)}
    row = DV_BLOCK["dv_delete_read_consistency"](spark, SF_DIR).collect()[0]
    assert row["n_deleted"] == 681


def test_dv_registration_survives_import_order():
    """The DV block must land INSIDE the checked window even when
    queries_dv is the first package module imported (review r13): a
    module that registers itself via a circular ``from .queries import
    register`` runs after ``_reorder_registry()`` in that ordering and
    silently appends its queries past the demoted tail. Registration
    therefore lives in queries.py; this pin imports queries_dv FIRST
    in a fresh interpreter and asserts window membership."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import cs_tutorial_reporting_spark.queries_dv as dv\n"
                "from cs_tutorial_reporting_spark.queries import QUERIES, _CHECK_WINDOW\n"
                "import json\n"
                "head = list(QUERIES)[:_CHECK_WINDOW]\n"
                "print(json.dumps({n: n in head for n in dv.DV_BLOCK}))\n"
            ),
        ],
        capture_output=True,
        text=True,
        cwd=repo,
    )
    # check=False + explicit assert: check=True would swallow the
    # child's stderr (the actual AssertionError) inside a bare
    # CalledProcessError (review r13 second batch)
    assert out.returncode == 0, out.stderr
    membership = json.loads(out.stdout.strip().splitlines()[-1])
    assert membership == {
        "dv_delete_read_consistency": True,
        "dv_chain_time_travel": True,
        "dv_compaction_equivalence": True,
    }, membership
