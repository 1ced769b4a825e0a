"""Golden-invariant parity against the reference's seed fixtures
(FIXTURES.md; values derived from the reference SQL's actual behavior).

Note on breach_direction: FIXTURES.md predicts 14× above_upper, but the
reference's own CASE (fct_anomaly_events.sql:67-78) routes vibration
anomalies to 'below_lower' (vibration is absent from the first WHEN's
metric list). Parity means reproducing the code, not the prose: 10
temperature → above_upper, 4 vibration → below_lower. Verified
independently against DuckDB executing the reference expressions in
tests/test_oracle_selfcheck.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_staging_row_counts(dag):
    assert dag["stg_sensor_readings"].count() == 209
    assert dag["stg_devices"].count() == 10
    assert dag["stg_alerts"].count() == 24


def test_cleaned_dedup_is_noop_on_fixture(dag):
    # all 209 reading_ids are unique; content-duplicate R189 must survive
    cleaned = dag["int_sensor_readings_cleaned"]
    assert cleaned.count() == 209
    assert cleaned.filter(F.col("reading_id") == "R189").count() == 1


def test_missing_and_anomaly_flags(dag):
    cleaned = dag["int_sensor_readings_cleaned"]
    assert cleaned.filter("is_missing_value").count() == 2
    anomalies = cleaned.filter("is_anomaly")
    assert anomalies.count() == 14
    by_dev = {
        r["device_id"]: r["n"]
        for r in anomalies.groupBy("device_id").agg(F.count("*").alias("n")).collect()
    }
    assert by_dev == {"DEV004": 11, "DEV009": 3}
    by_metric = {
        r["metric_name"]: r["n"]
        for r in anomalies.groupBy("metric_name").agg(F.count("*").alias("n")).collect()
    }
    assert by_metric == {"temperature": 10, "vibration": 4}


def test_device_health_groups(dag):
    assert dag["int_device_health"].count() == 115
    assert dag["fct_hourly_metrics"].count() == 115


def test_device_summary_and_dim(dag):
    summary = dag["fct_device_summary"]
    assert summary.count() == 10
    dates = summary.select("reading_date").distinct().collect()
    assert len(dates) == 1
    assert str(dates[0][0]) == "2025-01-15"
    assert dag["dim_devices"].count() == 10


def test_alerts_enriched(dag):
    enriched = dag["int_alerts_enriched"]
    assert enriched.count() == 24
    assert enriched.filter("is_resolved").count() == 6


def test_anomaly_events_breach_direction(dag):
    events = dag["fct_anomaly_events"]
    assert events.count() == 14
    by_dir = {
        r["breach_direction"]: r["n"]
        for r in events.groupBy("breach_direction").agg(F.count("*").alias("n")).collect()
    }
    # reference CASE quirk: vibration anomalies fall through to below_lower
    assert by_dir == {"above_upper": 10, "below_lower": 4}
    # vibration rows have no lower threshold in the config
    assert (
        events.filter("metric_name = 'vibration'")
        .filter(F.col("lower_threshold").isNotNull())
        .count()
        == 0
    )


def test_surrogate_key_format(dag):
    """dbt_utils 1.3.3 byte-compat: md5 of '-'-joined stringified cols."""
    import hashlib

    row = dag["dim_devices"].filter("device_id = 'DEV001'").first()
    assert row["device_key"] == hashlib.md5(b"DEV001").hexdigest()

    hrow = dag["int_device_health"].filter(
        "device_id = 'DEV001' and metric_name = 'temperature'"
    ).orderBy("reading_hour").first()
    expected = hashlib.md5(
        f"DEV001-temperature-{hrow['reading_hour']}".encode()
    ).hexdigest()
    assert hrow["device_health_key"] == expected


def test_health_score_bounds(dag):
    rows = dag["fct_device_summary"].select("health_score", "health_category").collect()
    for r in rows:
        assert 0 <= r["health_score"] <= 100
        assert r["health_category"] in {"healthy", "degraded", "at_risk", "critical"}
