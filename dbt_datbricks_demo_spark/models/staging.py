"""Bronze staging models — typed, renamed views over the raw sources.

Parity targets (behavior, not text):
  stg_sensor_readings — reference models/staging/stg_sensor_readings.sql:15-26
  stg_devices         — reference models/staging/stg_devices.sql:14-29
  stg_alerts          — reference models/staging/stg_alerts.sql:14-33

All three are narrow projections (rename + cast + a couple of derived
flags); they stay inside whole-stage codegen and cost one scan each.
Materialized as views (reference dbt_project.yml:31) so they add no storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.config import RunConfig
from dbt_datbricks_demo_spark.models._common import now_col, today_col


def stg_sensor_readings(raw_sensor_readings: DataFrame, cfg: RunConfig) -> DataFrame:
    """Normalize metric names, enforce double/timestamp types, stamp lineage."""
    return raw_sensor_readings.select(
        F.col("reading_id"),
        F.col("device_id"),
        F.lower(F.trim(F.col("metric_name"))).alias("metric_name"),
        F.col("metric_value").cast("double").alias("metric_value"),
        F.col("reading_ts").cast("timestamp").alias("reading_ts"),
        F.col("ingested_at").cast("timestamp").alias("ingested_at"),
        now_col(cfg).alias("_dbt_loaded_at"),
        F.lit(cfg.invocation_id).alias("_dbt_invocation_id"),
    )


def stg_devices(raw_devices: DataFrame, cfg: RunConfig) -> DataFrame:
    """Rename location→plant_location / zone→factory_zone, type casts,
    derived days_since_install = datediff(today, install_date)."""
    install_date = F.col("install_date").cast("date")
    return raw_devices.select(
        F.col("device_id"),
        F.col("device_name"),
        F.lower(F.trim(F.col("device_type"))).alias("device_type"),
        F.col("location").alias("plant_location"),
        F.col("zone").alias("factory_zone"),
        install_date.alias("install_date"),
        F.col("manufacturer"),
        F.col("firmware_version"),
        F.col("is_active").cast("boolean").alias("is_active"),
        F.datediff(today_col(cfg), install_date).alias("days_since_install"),
        now_col(cfg).alias("_dbt_loaded_at"),
    )


def stg_alerts(raw_alerts: DataFrame, cfg: RunConfig) -> DataFrame:
    """Normalize categorical fields, cast numerics/timestamps, derive
    is_resolved = resolved_at IS NOT NULL."""
    return raw_alerts.select(
        F.col("alert_id"),
        F.col("device_id"),
        F.lower(F.trim(F.col("alert_type"))).alias("alert_type"),
        F.lower(F.trim(F.col("severity"))).alias("severity"),
        F.lower(F.trim(F.col("metric_name"))).alias("metric_name"),
        F.col("threshold_value").cast("double").alias("threshold_value"),
        F.col("actual_value").cast("double").alias("actual_value"),
        F.col("alert_ts").cast("timestamp").alias("alert_ts"),
        F.col("resolved_at").cast("timestamp").alias("resolved_at"),
        F.col("resolution_notes"),
        F.col("resolved_at").cast("timestamp").isNotNull().alias("is_resolved"),
        now_col(cfg).alias("_dbt_loaded_at"),
    )
