"""The 7 EDA queries + layer report against FIXTURES.md golden
invariants (reference notebooks/iot_eda_analysis.sql:32-161,
databricks_data_flow.sql:164-177)."""

from __future__ import annotations

from dbt_datbricks_demo_spark.queries.eda import ALL_EDA


def test_fleet_health_least_healthy_first(dag):
    rows = ALL_EDA["fleet_health"](dag).collect()
    assert len(rows) == 10
    assert rows[0]["device_name"] == "Furnace-A4"  # DEV004, score 0
    assert rows[0]["health_score"] == 0.0
    scores = [r["health_score"] for r in rows]
    assert scores == sorted(scores)


def test_temperature_anomalies_all_above_upper(dag):
    rows = ALL_EDA["temperature_anomalies"](dag).collect()
    assert len(rows) == 10  # FIXTURES: 10 temperature anomalies
    assert all(r["breach_direction"] == "above_upper" for r in rows)
    vals = [r["actual_value"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_hourly_temperature_series(dag):
    rows = ALL_EDA["hourly_temperature"](dag).collect()
    assert len(rows) > 0
    assert all(r["avg_temperature"] is not None for r in rows)


def test_device_lifetime_rates(dag):
    rows = ALL_EDA["device_lifetime"](dag).collect()
    assert len(rows) == 10
    by_name = {r["device_name"]: r for r in rows}
    assert by_name["Furnace-A4"]["lifetime_anomalies"] == 11
    assert by_name["Boiler-C9"]["lifetime_anomalies"] == 3


def test_alert_resolution_rollup(dag):
    rows = ALL_EDA["alert_resolution"](dag).collect()
    assert sum(r["total_alerts"] for r in rows) == 24  # all seed alerts
    crit = [r["critical_count"] for r in rows]
    assert crit == sorted(crit, reverse=True)


def test_missing_readings_having(dag):
    rows = ALL_EDA["missing_readings"](dag).collect()
    # FIXTURES: exactly 2 missing values, on distinct device/metric combos
    assert sum(r["missing_count"] for r in rows) == 2
    assert all(r["missing_count"] > 0 for r in rows)  # HAVING applied


def test_vibration_variance_nulls_last(dag):
    rows = ALL_EDA["vibration_variance"](dag).collect()
    stds = [r["vibration_stddev"] for r in rows]
    non_null = [s for s in stds if s is not None]
    assert non_null == sorted(non_null, reverse=True)
    # desc NULLS LAST: any nulls trail the non-null values
    assert stds[: len(non_null)] == non_null


def test_layer_row_counts(dag):
    rows = {r["relation"]: r["row_count"] for r in ALL_EDA["layer_row_counts"](dag).collect()}
    assert rows["stg_sensor_readings"] == 209
    assert rows["stg_devices"] == 10
    assert rows["stg_alerts"] == 24
    assert rows["int_device_health"] == 115
    assert rows["fct_hourly_metrics"] == 115
    assert rows["fct_anomaly_events"] == 14
    assert rows["dim_devices"] == 10
