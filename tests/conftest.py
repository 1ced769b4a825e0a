"""Shared pytest fixtures: one local SparkSession, reference seed data,
a frozen-clock RunConfig, and the built model DAG."""

from __future__ import annotations

import datetime as dt

import pytest

from dbt_datbricks_demo_spark.config import RunConfig
from dbt_datbricks_demo_spark.session import get_spark
from dbt_datbricks_demo_spark.sources import load_seeds
from dbt_datbricks_demo_spark import models as M

SEEDS_DIR = "/root/reference/seeds"
SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

FROZEN_NOW = dt.datetime(2025, 1, 16, 12, 0, 0)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def cfg():
    return RunConfig(invocation_id="test-run", frozen_now=FROZEN_NOW)


@pytest.fixture(scope="session")
def seeds(spark):
    return load_seeds(spark, SEEDS_DIR)


@pytest.fixture(scope="session")
def dag(spark, seeds, cfg):
    """All 10 models built (full-refresh mode), keyed by model name."""
    stg_r = M.stg_sensor_readings(seeds["raw_sensor_readings"], cfg)
    stg_d = M.stg_devices(seeds["raw_devices"], cfg)
    stg_a = M.stg_alerts(seeds["raw_alerts"], cfg)
    cleaned = M.int_sensor_readings_cleaned(stg_r, stg_d, cfg)
    health = M.int_device_health(cleaned, cfg)
    enriched = M.int_alerts_enriched(stg_a, stg_d, cfg)
    out = {
        "stg_sensor_readings": stg_r,
        "stg_devices": stg_d,
        "stg_alerts": stg_a,
        "int_sensor_readings_cleaned": cleaned,
        "int_device_health": health,
        "int_alerts_enriched": enriched,
        "fct_hourly_metrics": M.fct_hourly_metrics(health, cfg),
        "fct_device_summary": M.fct_device_summary(cleaned, enriched, cfg),
        "fct_anomaly_events": M.fct_anomaly_events(cleaned, cfg),
        "dim_devices": M.dim_devices(stg_d, cleaned, cfg),
    }
    # cache: every test reuses these tiny frames
    for df in out.values():
        df.cache()
    return out
