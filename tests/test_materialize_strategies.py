"""Incremental strategies beyond MERGE (dbt-databricks parity):
insert_overwrite (dynamic partition replacement), append (file-level
insert-only), partitioned tables with PartitionFilters pruning, and
model contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.plans.contracts import (
    ContractViolation,
    enforce_contract,
)
from dbt_datbricks_demo_spark.plans.materialize import Materializer


@pytest.fixture()
def mat(spark, tmp_path):
    return Materializer(spark, str(tmp_path / "wh"))


def _days(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, day=d, v=v) for i, d, v in rows], "id long, day string, v double"
    )


def test_insert_overwrite_replaces_only_touched_partitions(spark, mat):
    first = _days(spark, [(1, "d1", 1.0), (2, "d1", 2.0), (3, "d2", 3.0)])
    mat.insert_overwrite("t", "silver", first, partition_by="day")
    assert mat.read("t", "silver").count() == 3

    # reprocess d2 with corrected values + a new day d3; d1 must survive
    # byte-for-byte untouched
    increment = _days(spark, [(30, "d2", 30.0), (4, "d3", 4.0)])
    out = mat.insert_overwrite("t", "silver", increment, partition_by="day")
    got = {(r["id"], r["day"], r["v"]) for r in out.collect()}
    assert got == {(1, "d1", 1.0), (2, "d1", 2.0), (30, "d2", 30.0), (4, "d3", 4.0)}


def test_insert_overwrite_is_idempotent(spark, mat):
    inc = _days(spark, [(1, "d1", 1.0), (2, "d2", 2.0)])
    mat.insert_overwrite("t", "silver", inc, partition_by="day")
    out = mat.insert_overwrite("t", "silver", inc, partition_by="day")
    assert out.count() == 2  # rerunning a day never duplicates rows


def test_insert_overwrite_survives_hive_escaped_partition_values(spark, mat):
    """Partition values that hive-escape in directory names (timestamp
    ':' → %3A) and NULLs (__HIVE_DEFAULT_PARTITION__) must still be
    swapped in — a formatted f"{col}={val}" lookup would miss the
    escaped dir and silently keep stale data."""
    rows = spark.createDataFrame(
        [Row(id=1, hr="2024-01-01 00:00:00", v=1.0),
         Row(id=2, hr=None, v=2.0)],
        "id long, hr string, v double",
    )
    mat.insert_overwrite("esc", "silver", rows, partition_by="hr")
    # reprocess both partitions with corrected values
    fixed = spark.createDataFrame(
        [Row(id=10, hr="2024-01-01 00:00:00", v=10.0),
         Row(id=20, hr=None, v=20.0)],
        "id long, hr string, v double",
    )
    out = mat.insert_overwrite("esc", "silver", fixed, partition_by="hr")
    got = {(r["id"], r["v"]) for r in out.collect()}
    assert got == {(10, 10.0), (20, 20.0)}, got


def test_append_strategy_accumulates_without_rewrite(spark, mat):
    mat.append("ev", "silver", _days(spark, [(1, "d1", 1.0)]))
    out = mat.append("ev", "silver", _days(spark, [(2, "d1", 9.0)]))
    assert out.count() == 2
    # appending again with the same rows DOES duplicate: append is
    # insert-only by definition (that's the documented contract)
    assert mat.append("ev", "silver", _days(spark, [(2, "d1", 9.0)])).count() == 3


def test_partitioned_table_prunes_on_partition_key(spark, mat):
    df = _days(spark, [(i, f"d{i % 4}", float(i)) for i in range(40)])
    out = mat.as_partitioned_table("pt", "gold", df, ["day"])
    plan = (
        out.filter(F.col("day") == "d1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(day" in plan, plan[:800]
    assert out.filter(F.col("day") == "d1").count() == 10


def test_contract_passes_and_reports_all_violations(spark):
    df = spark.createDataFrame([Row(id=1, name="a", score=0.5)])
    ok = enforce_contract(
        df, {"id": "bigint", "name": "string", "score": "double"}, model="m"
    )
    assert ok is df

    with pytest.raises(ContractViolation) as ei:
        enforce_contract(
            df, {"id": "string", "missing_col": "int"}, model="m"
        )
    msg = str(ei.value)
    assert "column 'id': contract string, actual bigint" in msg
    assert "missing column 'missing_col'" in msg
    assert "unexpected column 'name'" in msg

    # SQL-spelled type aliases normalize (varchar == string, long == bigint)
    enforce_contract(
        df,
        {"id": "long", "name": "varchar", "score": "float8"},
        model="m",
    )
