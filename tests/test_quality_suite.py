"""The reference's 54-test data-quality suite must pass on the fixture
pipeline, and each generic test must actually detect violations."""

from __future__ import annotations

import pyspark.sql.functions as F

from dbt_datbricks_demo_spark.testing import (
    accepted_values,
    not_null,
    reference_suite,
    relationships,
    run_suite,
    unique,
    value_in_range,
)
from dbt_datbricks_demo_spark.testing.runner import run_test


def test_54_tests_all_pass(dag):
    specs = reference_suite()
    assert len(specs) == 54
    results = run_suite(specs, dag, threads=4)
    failed = [r for r in results if not r.passed]
    assert not failed, f"failing tests: {[r.name for r in failed]}"


def test_generic_tests_detect_violations(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", None, "y"), (None, 3, "zz")],
        "id string, v int, cat string",
    )
    assert not_null(df, "id").count() == 1
    assert not_null(df, "v").count() == 1
    assert unique(df, "id").count() == 1  # 'a' twice; null ignored
    assert accepted_values(df, "cat", ["x", "y"]).count() == 1  # 'zz'
    parent = spark.createDataFrame([("a",)], "id string")
    assert relationships(df, "id", parent, "id").count() == 0  # nulls skipped
    child = spark.createDataFrame([("b",)], "id string")
    assert relationships(child, "id", parent, "id").count() == 1
    nums = spark.createDataFrame([(5,), (500,), (500,), (None,)], "v int")
    viol = value_in_range(nums, "v", 0, 100).collect()
    assert len(viol) == 1 and viol[0]["occurrences"] == 2


def test_failing_suite_reports_counts(spark, dag):
    from dbt_datbricks_demo_spark.testing.runner import TestSpec

    bad = TestSpec(
        "always_fails", "stg_devices",
        lambda rel: rel["stg_devices"].filter(F.col("is_active")),
    )
    res = run_test(bad, dag)
    assert not res.passed and res.failures == 10


def test_testdata_suite_all_pass(spark):
    """The generic-test framework generalizes past the IoT models: the
    declared suite over the TPC-H-ish testdata tables passes wholesale."""
    from dbt_datbricks_demo_spark.sources.testdata import register_testdata
    from dbt_datbricks_demo_spark.testing.runner import run_suite, summarize
    from dbt_datbricks_demo_spark.testing.testdata_suite import testdata_suite

    relations = register_testdata(spark, "/root/testdata/sf0.001")
    results = run_suite(testdata_suite(), relations)
    assert len(results) >= 26
    failed = [r.name for r in results if not r.passed]
    assert not failed, summarize(results)


def test_store_failures_persists_violations(spark, tmp_path):
    """dbt --store-failures parity: a failing test writes its violating
    rows to an audit path named after the test; passing tests write
    nothing."""
    from pyspark.sql import Row

    from dbt_datbricks_demo_spark.testing import not_null, unique
    from dbt_datbricks_demo_spark.testing.runner import TestSpec, run_suite

    df = spark.createDataFrame(
        [Row(id=1), Row(id=1), Row(id=None)]
    )
    relations = {"t": df}
    specs = [
        TestSpec("unique_t_id", "t", lambda r: unique(r["t"], "id")),
        TestSpec("not_null_t_id", "t", lambda r: not_null(r["t"], "id")),
    ]
    audit = str(tmp_path / "audit")
    results = run_suite(specs, relations, store_failures_dir=audit)
    assert all(not r.passed for r in results)
    stored = spark.read.parquet(f"{audit}/unique_t_id").collect()
    assert len(stored) == 1  # one duplicated key group
    stored_nn = spark.read.parquet(f"{audit}/not_null_t_id").collect()
    assert len(stored_nn) == 1


def test_compare_relations_classifies_drift(spark):
    """dbt-audit-helper parity: added/removed/changed/identical counts
    plus per-column drift, and the cell-level drilldown."""
    from pyspark.sql import Row

    from dbt_datbricks_demo_spark.testing.audit import (
        changed_rows,
        compare_relations,
    )

    old = spark.createDataFrame(
        [
            Row(id=1, v=10.0, s="a"),
            Row(id=2, v=20.0, s="b"),
            Row(id=3, v=30.0, s="c"),  # removed in new
        ]
    )
    new = spark.createDataFrame(
        [
            Row(id=1, v=10.0, s="a"),  # identical
            Row(id=2, v=99.0, s="b"),  # v changed
            Row(id=4, v=40.0, s="d"),  # added
        ]
    )
    summary = compare_relations(old, new, "id").collect()[0]
    assert (summary["n_old"], summary["n_new"]) == (3, 3)
    assert summary["n_added"] == 1 and summary["n_removed"] == 1
    assert summary["n_changed"] == 1 and summary["n_identical"] == 1
    assert summary["changed_v"] == 1 and summary["changed_s"] == 0

    drill = changed_rows(old, new, "id").collect()
    assert [(r["id"], r["column"], r["old_value"], r["new_value"]) for r in drill] == [
        (2, "v", "20.0", "99.0")
    ]
