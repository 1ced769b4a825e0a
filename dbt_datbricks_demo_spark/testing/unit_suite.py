"""Registered model unit tests (the suite `unit-test` runs).

Each spec exercises one subtle piece of model logic against mock
inputs — the cases SURVEY.md §7 "hard parts" calls out: the anomaly
CASE ladder, keep-latest dedup, and the health-score operand order.
"""

from __future__ import annotations

from dbt_datbricks_demo_spark.testing.unit import UnitTest

_DEVICE = {
    "device_id": "D1", "device_name": "press", "device_type": "sensor",
    "plant_location": "berlin", "factory_zone": "A", "manufacturer": "acme",
}


def _reading(rid, value, ingested="2025-01-15 08:00:05", anomaly=False):
    return {
        "reading_id": rid, "device_id": "D1", "metric_name": "temperature",
        "metric_value": value, "reading_ts": "2025-01-15 08:00:00",
        "ingested_at": ingested,
    }


UNIT_SUITE: list[UnitTest] = [
    UnitTest(
        name="anomaly_case_ladder",
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
    ),
    UnitTest(
        name="dedup_keeps_latest_ingest",
        model="int_sensor_readings_cleaned",
        given={
            "stg_sensor_readings": [
                _reading("R1", 10.0, ingested="2025-01-15 08:00:05"),
                _reading("R1", 99.0, ingested="2025-01-15 09:00:05"),
            ],
            "stg_devices": [_DEVICE],
        },
        expect=[{"reading_id": "R1", "metric_value": 99.0}],
    ),
    UnitTest(
        name="health_score_operand_order",
        model="fct_device_summary",
        given={
            "int_sensor_readings_cleaned": [
                {
                    "reading_id": f"R{i}", "device_id": "D1",
                    "metric_name": "temperature",
                    "metric_value": 95.5 if i == 0 else 20.0,
                    "is_anomaly": i == 0, "is_missing_value": False,
                    "reading_ts": "2025-01-15 08:00:00",
                    "device_name": "press", "device_type": "sensor",
                    "plant_location": "berlin", "factory_zone": "A",
                }
                for i in range(2)
            ],
            "int_alerts_enriched": [
                {
                    "alert_id": "A1", "device_id": "D1",
                    "severity": "critical",
                    "alert_ts": "2025-01-15 09:00:00", "is_resolved": True,
                    "minutes_to_resolve": 30.0,
                }
            ],
        },
        # 100 - 1*20 - 0*5 - 50*0.5 - 0*0.3 = 55
        expect=[
            {"device_id": "D1", "health_score": 55.0,
             "health_category": "at_risk"}
        ],
    ),
]
