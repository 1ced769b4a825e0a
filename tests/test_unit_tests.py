"""dbt-1.8-style model unit tests: run one model against mock inputs,
compare to expected rows on the expectation's columns only."""

from __future__ import annotations

from dbt_datbricks_demo_spark.testing.unit import (
    UnitTest,
    run_unit_suite,
    run_unit_test,
)

# mocks are the model's DIRECT inputs (the staged relations), matching
# dbt unit-test semantics where `given` rows stand in for ref() outputs
_DEVICE = {
    "device_id": "D1", "device_name": "press", "device_type": "sensor",
    "plant_location": "berlin", "factory_zone": "A", "manufacturer": "acme",
}


def _reading(rid, value, metric="temperature", ingested="2025-01-15 08:00:05"):
    return {
        "reading_id": rid, "device_id": "D1", "metric_name": metric,
        "metric_value": value, "reading_ts": "2025-01-15 08:00:00",
        "ingested_at": ingested,
    }


def test_anomaly_flag_logic_in_isolation(spark, cfg):
    """Temperature above the configured upper threshold (85.0) flags
    is_anomaly; a normal reading does not; NULL flags is_missing_value —
    the reference CASE ladder tested without any warehouse data."""
    spec = UnitTest(
        name="anomaly_flags",
        model="int_sensor_readings_cleaned",
        given={
            "stg_sensor_readings": [
                _reading("R1", 95.5),
                _reading("R2", 21.0),
                _reading("R3", None),
            ],
            "stg_devices": [_DEVICE],
        },
        expect=[
            {"reading_id": "R1", "is_anomaly": True, "is_missing_value": False},
            {"reading_id": "R2", "is_anomaly": False, "is_missing_value": False},
            {"reading_id": "R3", "is_anomaly": False, "is_missing_value": True},
        ],
    )
    res = run_unit_test(spark, spec, cfg)
    assert res.passed, res.message


def test_dedup_keeps_latest_ingest(spark, cfg):
    spec = UnitTest(
        name="dedup_keep_latest",
        model="int_sensor_readings_cleaned",
        given={
            "stg_sensor_readings": [
                _reading("R1", 10.0, ingested="2025-01-15 08:00:05"),
                _reading("R1", 99.0, ingested="2025-01-15 09:00:05"),
            ],
            "stg_devices": [_DEVICE],
        },
        expect=[{"reading_id": "R1", "metric_value": 99.0}],
    )
    res = run_unit_test(spark, spec, cfg)
    assert res.passed, res.message


def test_failure_reports_actionable_diff(spark, cfg):
    spec = UnitTest(
        name="wrong_expectation",
        model="int_sensor_readings_cleaned",
        given={
            "stg_sensor_readings": [_reading("R1", 95.5)],
            "stg_devices": [_DEVICE],
        },
        expect=[{"reading_id": "R1", "is_anomaly": False}],
    )
    res = run_unit_test(spark, spec, cfg)
    assert not res.passed
    assert "rows differ" in res.message


def test_suite_surfaces_missing_mocks_and_unknown_models(spark, cfg):
    results = run_unit_suite(
        spark,
        [
            UnitTest("no_such", "no_such_model", given={}, expect=[]),
            UnitTest(
                "missing_dep", "int_sensor_readings_cleaned",
                given={"stg_sensor_readings": [_reading("R1", 1.0)]},
                expect=[],
            ),
        ],
        cfg,
    )
    assert [r.passed for r in results] == [False, False]
    assert "unknown model" in results[0].message
    assert "stg_devices" in results[1].message


def test_overrides_actually_change_model_config(spark, cfg):
    """A spec's cfg overrides must reach the model: raising the
    temperature_upper threshold above the reading flips is_anomaly.
    (Previously with_overrides didn't exist and overrides were a silent
    no-op behind a hasattr guard.)"""
    given = {
        "stg_sensor_readings": [_reading("R1", 95.5)],
        "stg_devices": [_DEVICE],
    }
    base = run_unit_test(
        spark,
        UnitTest("o1", "int_sensor_readings_cleaned", given=given,
                 expect=[{"reading_id": "R1", "is_anomaly": True}]),
        cfg,
    )
    assert base.passed, base.message
    overridden = run_unit_test(
        spark,
        UnitTest("o2", "int_sensor_readings_cleaned", given=given,
                 expect=[{"reading_id": "R1", "is_anomaly": False}],
                 overrides={"temperature_upper": 200.0}),
        cfg,
    )
    assert overridden.passed, overridden.message

    import pytest

    with pytest.raises(ValueError, match="unknown config overrides"):
        run_unit_test(
            spark,
            UnitTest("o3", "int_sensor_readings_cleaned", given=given,
                     expect=[], overrides={"not_a_var": 1}),
            cfg,
        )


def test_comparison_is_typed_not_stringified(spark, cfg):
    """Type drift must fail: expecting the string 'True' where the model
    produces boolean True is a bug the old str() compare hid."""
    spec = UnitTest(
        name="typed",
        model="int_sensor_readings_cleaned",
        given={
            "stg_sensor_readings": [_reading("R1", 95.5)],
            "stg_devices": [_DEVICE],
        },
        expect=[{"reading_id": "R1", "is_anomaly": "True"}],
    )
    res = run_unit_test(spark, spec, cfg)
    assert not res.passed


def test_health_score_formula_in_isolation(spark, cfg):
    """SURVEY hard-part #8: health_score = round(greatest(0, 100
    - crit*20 - warn*5 - anomaly_pct*0.5 - (100-completeness)*0.3), 0)
    with exact operand order — verified against hand-computed values on
    mock silver inputs (one critical alert + one half-anomalous day)."""
    readings = [
        {
            "reading_id": f"R{i}", "device_id": "D1",
            "metric_name": "temperature",
            # two readings, one anomalous -> anomaly_rate 50%
            "metric_value": 95.5 if i == 0 else 20.0,
            "is_anomaly": i == 0, "is_missing_value": False,
            "reading_ts": "2025-01-15 08:00:00",
            "device_name": "press", "device_type": "sensor",
            "plant_location": "berlin", "factory_zone": "A",
        }
        for i in range(2)
    ]
    alerts = [
        {
            "alert_id": "A1", "device_id": "D1", "severity": "critical",
            "alert_ts": "2025-01-15 09:00:00", "is_resolved": True,
            "minutes_to_resolve": 30.0,
        }
    ]
    # 100 - 1*20 - 0*5 - 50*0.5 - 0*0.3 = 55.0
    spec = UnitTest(
        name="health_score",
        model="fct_device_summary",
        given={
            "int_sensor_readings_cleaned": readings,
            "int_alerts_enriched": alerts,
        },
        expect=[{"device_id": "D1", "health_score": 55.0,
                 "health_category": "at_risk"}],
    )
    res = run_unit_test(spark, spec, cfg)
    assert res.passed, res.message
