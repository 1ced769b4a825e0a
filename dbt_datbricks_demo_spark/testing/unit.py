"""Model unit tests (dbt 1.8 `unit_tests:` parity).

A dbt unit test runs one MODEL in isolation against hand-written mock
inputs and compares the result to hand-written expected rows — logic
testing without touching warehouse data. The Spark-native equivalent:
build the model's DataFrame from small mock DataFrames for each
dependency and diff against the expectation, order-insensitively, on
the expectation's columns only (dbt semantics: unspecified columns are
ignored, unspecified mock columns are NULL-filled).

    spec = UnitTest(
        name="anomaly_flag_logic",
        model="int_sensor_readings_cleaned",
        given={"stg_sensor_readings": [...rows...], "stg_devices": [...]},
        expect=[{"reading_id": "R1", "is_anomaly": True}, ...],
    )
    result = run_unit_test(spark, spec, cfg)

Mock rows are dicts; missing keys become NULLs with the column type
taken from the real model's schema when resolvable, else inferred.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from dbt_datbricks_demo_spark.config import RunConfig
from dbt_datbricks_demo_spark.plans.dag import MODELS


@dataclass(frozen=True)
class UnitTest:
    name: str
    model: str
    given: Mapping[str, Sequence[Mapping]]  # dep name -> mock rows
    expect: Sequence[Mapping]  # expected rows (subset of columns ok)
    overrides: Mapping[str, object] = field(default_factory=dict)  # cfg vars


@dataclass(frozen=True)
class UnitTestResult:
    name: str
    passed: bool
    message: str


def _mock_df(
    spark: SparkSession, rows: Sequence[Mapping], schema_hint: str | None
) -> DataFrame:
    cols: list[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    data = [tuple(r.get(c) for c in cols) for r in rows]
    if schema_hint:
        return spark.createDataFrame(data, schema_hint)
    pdf_rows = [dict(zip(cols, t)) for t in data]
    return spark.createDataFrame(pdf_rows)


def run_unit_test(
    spark: SparkSession, spec: UnitTest, cfg: RunConfig | None = None
) -> UnitTestResult:
    if spec.model not in MODELS:
        return UnitTestResult(spec.name, False, f"unknown model {spec.model!r}")
    model = MODELS[spec.model]
    cfg = cfg or RunConfig()
    if spec.overrides:
        cfg = cfg.with_overrides(**spec.overrides)

    relations = {
        dep: _mock_df(spark, rows, None) for dep, rows in spec.given.items()
    }
    missing = [d for d in model.deps if d not in relations]
    if missing:
        return UnitTestResult(
            spec.name, False, f"mock inputs missing for deps {missing}"
        )

    try:
        actual = model.build(relations, cfg, None)
    except Exception as e:  # noqa: BLE001
        return UnitTestResult(spec.name, False, f"model raised {type(e).__name__}: {e}")

    expect_cols: list[str] = []
    for r in spec.expect:
        for k in r:
            if k not in expect_cols:
                expect_cols.append(k)
    absent = [c for c in expect_cols if c not in actual.columns]
    if absent:
        return UnitTestResult(
            spec.name, False, f"model output lacks expected columns {absent}"
        )

    # Typed, order-insensitive comparison: values are matched as-is so
    # type drift (1 vs '1', True vs 'True', None vs 'None') fails the
    # test instead of stringifying into a false pass. repr-keyed sort is
    # for deterministic ordering/diff display only.
    got = sorted(
        (
            tuple(row[c] for c in expect_cols)
            for row in actual.select(*expect_cols).collect()
        ),
        key=repr,
    )
    want = sorted(
        (tuple(r.get(c) for c in expect_cols) for r in spec.expect), key=repr
    )
    if got == want:
        return UnitTestResult(spec.name, True, "ok")
    return UnitTestResult(
        spec.name,
        False,
        f"rows differ on {expect_cols}: got {got[:5]}..., want {want[:5]}...",
    )


def run_unit_suite(
    spark: SparkSession, specs: Sequence[UnitTest], cfg: RunConfig | None = None
) -> list[UnitTestResult]:
    return [run_unit_test(spark, s, cfg) for s in specs]
