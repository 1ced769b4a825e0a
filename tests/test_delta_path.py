"""Delta-format materialization path — the test matrix.

The reference's S6 MERGE and S9 maintenance verbs run on Delta Lake
(reference notebooks/databricks_data_flow.sql:193-203, 255-268).
delta-spark is NOT installable in this sandbox, so:

  * sandbox (this CI): the parquet emulation is fully exercised by
    test_runner_incremental / test_maintenance, and every test below
    reports SKIPPED with the reason — the Delta branch is visible, not
    silently dead;
  * Delta-enabled cluster (delta-spark importable + Delta session
    extensions configured): the same tests below activate automatically
    and exercise the native DeltaTable.merge + transactional overwrite
    branch end-to-end. Run them with:
        pip install delta-spark
        pytest tests/test_delta_path.py

The only Delta-specific code path that RUNS here is the constructor
guard: asking for table_format='delta' without delta-spark must fail
loudly, never fall back silently.
"""

from __future__ import annotations

import pytest

from dbt_datbricks_demo_spark.plans.materialize import _HAVE_DELTA, Materializer

DELTA_SKIP = pytest.mark.skipif(
    not _HAVE_DELTA,
    reason="delta-spark not importable in this sandbox; the Delta MERGE "
    "branch needs a Delta-enabled cluster (see module docstring)",
)


def test_delta_format_without_library_fails_loudly(spark, tmp_path):
    with pytest.raises(RuntimeError, match="delta-spark"):
        Materializer(spark, str(tmp_path), table_format="delta")


@DELTA_SKIP
def test_delta_ctas_then_merge_upserts(spark, tmp_path):
    mat = Materializer(spark, str(tmp_path), table_format="delta")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, s string, v long"
    )
    mat.as_table("t", "silver", base)
    newer = spark.createDataFrame(
        [(2, "b2", 21), (3, "c", 30)], "id long, s string, v long"
    )
    out = mat.merge_upsert("t", "silver", newer, "id")
    got = {(r["id"], r["s"], r["v"]) for r in out.collect()}
    assert got == {(1, "a", 10), (2, "b2", 21), (3, "c", 30)}


@DELTA_SKIP
def test_delta_merge_schema_evolution_appends_new_columns(spark, tmp_path):
    mat = Materializer(spark, str(tmp_path), table_format="delta")
    base = spark.createDataFrame([(1, "a")], "id long, s string")
    mat.as_table("t", "silver", base)
    evolved = spark.createDataFrame([(2, "b", 99)], "id long, s string, extra long")
    out = mat.merge_upsert("t", "silver", evolved, "id")
    rows = {r["id"]: r.asDict() for r in out.collect()}
    assert rows[2]["extra"] == 99
    assert rows[1]["extra"] is None  # old rows gain the column as null
