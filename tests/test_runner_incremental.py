"""End-to-end runner tests: full build, incremental merge semantics,
tag selection, gating, and control flow."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.config import RunConfig
from dbt_datbricks_demo_spark.plans import PipelineRunner
from dbt_datbricks_demo_spark.sources import load_seeds
from tests.conftest import FROZEN_NOW, SEEDS_DIR


@pytest.fixture()
def runner(spark, tmp_path):
    cfg = RunConfig(
        invocation_id="runner-test",
        frozen_now=FROZEN_NOW,
        warehouse_dir=str(tmp_path / "warehouse"),
    )
    return PipelineRunner(spark, cfg)


def test_full_build_then_incremental_noop(spark, runner, seeds):
    rel = runner.run(seeds)
    assert rel["int_sensor_readings_cleaned"].count() == 209
    assert rel["fct_device_summary"].count() == 10

    # second run: watermark filter (strict >) sees no new rows; silver
    # tables keep their contents, gold rebuilds identically
    rel2 = runner.run(seeds)
    assert rel2["int_sensor_readings_cleaned"].count() == 209
    assert rel2["fct_device_summary"].count() == 10


def test_incremental_upsert_updates_and_inserts(spark, runner, seeds):
    runner.run(seeds)

    # simulate a late batch: one updated reading (same key, newer ingest,
    # new value) + one brand-new reading
    updated = spark.createDataFrame(
        [
            ("R001", "DEV001", "temperature", 99.9,
             dt.datetime(2025, 1, 15, 8, 0, 0), dt.datetime(2025, 1, 15, 12, 0, 0)),
            ("R999", "DEV001", "temperature", 70.0,
             dt.datetime(2025, 1, 15, 11, 0, 0), dt.datetime(2025, 1, 15, 12, 0, 0)),
        ],
        seeds["raw_sensor_readings"].schema,
    )
    bumped = dict(seeds)
    bumped["raw_sensor_readings"] = seeds["raw_sensor_readings"].unionByName(updated)

    rel = runner.run(bumped)
    cleaned = rel["int_sensor_readings_cleaned"]
    assert cleaned.count() == 210  # 209 + R999; R001 merged, not duplicated
    r001 = cleaned.filter("reading_id = 'R001'").collect()
    assert len(r001) == 1
    assert r001[0]["metric_value"] == 99.9  # MERGE whenMatchedUpdateAll
    assert r001[0]["is_anomaly"] is True  # 99.9 > temperature_upper=85
    assert cleaned.filter("reading_id = 'R999'").count() == 1


def test_full_refresh_flag(spark, runner, seeds):
    runner.run(seeds)
    rel = runner.run(seeds, full_refresh=True)
    assert rel["int_sensor_readings_cleaned"].count() == 209


def test_tag_selection_bronze_only(spark, runner, seeds):
    rel = runner.run(seeds, select_tags={"bronze"})
    assert "stg_devices" in rel
    # gold models not built (not selected, never materialized)
    assert "fct_device_summary" not in rel or rel["fct_device_summary"] is None


def test_gated_run_builds_gold_when_silver_passes(spark, runner, seeds):
    rel, results = runner.run_gated(seeds)
    assert all(r.passed for r in results)
    assert rel["fct_device_summary"].count() == 10


def test_gate_blocks_gold_on_bad_data(spark, tmp_path, seeds):
    cfg = RunConfig(
        invocation_id="gate-test", frozen_now=FROZEN_NOW,
        warehouse_dir=str(tmp_path / "wh2"),
    )
    runner = PipelineRunner(spark, cfg)
    # orphan alert → singular test fails → gold must not be built
    orphan = spark.createDataFrame(
        [("ALT999", "DEV_MISSING", "threshold_breach", "critical", "temperature",
          85.0, 99.0, dt.datetime(2025, 1, 15, 9, 0), None, None)],
        seeds["raw_alerts"].schema,
    )
    bad = dict(seeds)
    bad["raw_alerts"] = seeds["raw_alerts"].unionByName(orphan)
    rel, results = runner.run_gated(bad)
    failed = {r.name for r in results if not r.passed}
    assert "assert_no_orphan_alerts" in failed
    assert not runner.mat.exists("fct_device_summary", "gold")


def test_per_plant_health(spark, runner, seeds):
    rel = runner.run(seeds)
    plants = runner.per_plant_health(rel)
    rows = {r["plant_location"]: r for r in plants.collect()}
    assert set(rows) == {"Plant-Detroit", "Plant-Chicago", "Plant-Austin"}
    assert sum(r["device_days"] for r in rows.values()) == 10
