"""The reference's 7 EDA queries (notebooks/iot_eda_analysis.sql:32-161)
as DataFrame functions over the built pipeline relations, plus the layer
row-count report (databricks_data_flow.sql:164-177).

Each takes the relations dict produced by PipelineRunner.run().
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fleet_health(rel: Mapping[str, DataFrame]) -> DataFrame:
    """EDA 1: device health scorecard, least healthy first."""
    return rel["fct_device_summary"].select(
        "device_name", "device_type", "plant_location", "health_score",
        "health_category", "total_readings", "anomaly_readings",
        "critical_alerts", "data_completeness_pct",
    ).orderBy(F.col("health_score").asc())


def temperature_anomalies(rel: Mapping[str, DataFrame]) -> DataFrame:
    """EDA 2: which devices are running hot."""
    return (
        rel["fct_anomaly_events"]
        .filter(F.col("metric_name") == "temperature")
        .select(
            "device_name", "plant_location", "anomaly_hour", "actual_value",
            "upper_threshold", "breach_direction",
        )
        .orderBy(F.col("actual_value").desc())
    )


def hourly_temperature(rel: Mapping[str, DataFrame]) -> DataFrame:
    """EDA 3: hourly average temperature time series."""
    return (
        rel["fct_hourly_metrics"]
        .filter(F.col("metric_name") == "temperature")
        .select(
            "reading_hour", "device_name",
            F.col("avg_value").alias("avg_temperature"),
            "anomaly_count", "health_status",
        )
        .orderBy("reading_hour", "device_name")
    )


def device_lifetime(rel: Mapping[str, DataFrame]) -> DataFrame:
    """EDA 4: lifetime anomaly rates per device."""
    return rel["dim_devices"].select(
        "device_name", "device_type", "plant_location", "manufacturer",
        "days_since_install", "lifetime_readings", "lifetime_anomalies",
        "lifetime_anomaly_rate_pct", "is_active",
    ).orderBy(F.col("lifetime_anomaly_rate_pct").desc())


def alert_resolution(rel: Mapping[str, DataFrame]) -> DataFrame:
    """EDA 5: alert resolution rollup per device/plant."""
    return (
        rel["int_alerts_enriched"]
        .groupBy("device_name", "plant_location")
        .agg(
            F.count(F.lit(1)).alias("total_alerts"),
            F.sum(F.when(F.col("severity") == "critical", 1).otherwise(0)).alias(
                "critical_count"
            ),
            F.sum(F.when(F.col("is_resolved"), 1).otherwise(0)).alias(
                "resolved_count"
            ),
            F.round(F.avg("minutes_to_resolve"), 1).alias("avg_resolution_min"),
        )
        .orderBy(F.col("critical_count").desc())
    )


def missing_readings(rel: Mapping[str, DataFrame]) -> DataFrame:
    """EDA 6: missing-data rollup with HAVING."""
    missing = F.when(F.col("is_missing_value"), 1).otherwise(0)
    return (
        rel["int_sensor_readings_cleaned"]
        .groupBy("device_name", "metric_name")
        .agg(
            F.count(F.lit(1)).alias("total_readings"),
            F.sum(missing).alias("missing_count"),
            F.round(F.sum(missing) * 100.0 / F.count(F.lit(1)), 2).alias(
                "missing_pct"
            ),
        )
        .filter(F.col("missing_count") > 0)
        .orderBy(F.col("missing_pct").desc())
    )


def vibration_variance(rel: Mapping[str, DataFrame]) -> DataFrame:
    """EDA 7: vibration stddev as a predictive-maintenance signal
    (desc NULLS LAST ordering — O2)."""
    return (
        rel["fct_hourly_metrics"]
        .filter(F.col("metric_name") == "vibration")
        .select(
            "device_name", "device_type", "plant_location",
            F.col("avg_value").alias("avg_vibration"),
            F.col("max_value").alias("peak_vibration"),
            F.col("stddev_value").alias("vibration_stddev"),
            "anomaly_rate_pct",
        )
        .orderBy(F.col("vibration_stddev").desc_nulls_last())
    )


def layer_row_counts(rel: Mapping[str, DataFrame]) -> DataFrame:
    """U1: UNION ALL row-count report across medallion layers."""
    names = [
        "stg_sensor_readings", "stg_devices", "stg_alerts",
        "int_sensor_readings_cleaned", "int_device_health",
        "int_alerts_enriched", "fct_hourly_metrics", "fct_device_summary",
        "fct_anomaly_events", "dim_devices",
    ]
    out = None
    for n in names:
        part = rel[n].agg(F.count(F.lit(1)).alias("row_count")).select(
            F.lit(n).alias("relation"), "row_count"
        )
        out = part if out is None else out.unionByName(part)
    return out


ALL_EDA = {
    "fleet_health": fleet_health,
    "temperature_anomalies": temperature_anomalies,
    "hourly_temperature": hourly_temperature,
    "device_lifetime": device_lifetime,
    "alert_resolution": alert_resolution,
    "missing_readings": missing_readings,
    "vibration_variance": vibration_variance,
    "layer_row_counts": layer_row_counts,
}
