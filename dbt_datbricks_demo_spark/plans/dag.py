"""Model registry and DAG (reference operators S2/S3: source()/ref()
resolution).

Each ModelDef declares its upstream dependencies by name; the runner
resolves them from a relations dict — the Spark-native equivalent of dbt's
manifest graph. Tags drive layer selection (reference dbt_project.yml:
bronze/staging, silver/intermediate, gold/marts).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from dbt_datbricks_demo_spark import models as M
from dbt_datbricks_demo_spark.config import RunConfig


@dataclass(frozen=True)
class ModelDef:
    name: str
    deps: tuple[str, ...]
    # builder(relations, cfg, watermark) -> DataFrame
    build: Callable[[Mapping[str, DataFrame], RunConfig, object], DataFrame]
    materialization: str = "view"  # view | table | incremental
    unique_key: str | None = None
    watermark_col: str | None = None  # incremental high-water column
    tags: tuple[str, ...] = field(default=())
    schema_suffix: str = "bronze"  # medallion routing (generate_schema_name)


MODELS: dict[str, ModelDef] = {
    m.name: m
    for m in [
        ModelDef(
            "stg_sensor_readings", ("raw_sensor_readings",),
            lambda r, c, w: M.stg_sensor_readings(r["raw_sensor_readings"], c),
            "view", tags=("bronze", "staging"), schema_suffix="bronze",
        ),
        ModelDef(
            "stg_devices", ("raw_devices",),
            lambda r, c, w: M.stg_devices(r["raw_devices"], c),
            "view", tags=("bronze", "staging"), schema_suffix="bronze",
        ),
        ModelDef(
            "stg_alerts", ("raw_alerts",),
            lambda r, c, w: M.stg_alerts(r["raw_alerts"], c),
            "view", tags=("bronze", "staging"), schema_suffix="bronze",
        ),
        ModelDef(
            "int_sensor_readings_cleaned", ("stg_sensor_readings", "stg_devices"),
            lambda r, c, w: M.int_sensor_readings_cleaned(
                r["stg_sensor_readings"], r["stg_devices"], c, watermark=w
            ),
            "incremental", unique_key="reading_id", watermark_col="ingested_at",
            tags=("silver", "intermediate", "incremental"), schema_suffix="silver",
        ),
        ModelDef(
            "int_device_health", ("int_sensor_readings_cleaned",),
            lambda r, c, w: M.int_device_health(
                r["int_sensor_readings_cleaned"], c, watermark=w
            ),
            "incremental", unique_key="device_health_key",
            watermark_col="_dbt_processed_at",
            tags=("silver", "intermediate"), schema_suffix="silver",
        ),
        ModelDef(
            "int_alerts_enriched", ("stg_alerts", "stg_devices"),
            lambda r, c, w: M.int_alerts_enriched(
                r["stg_alerts"], r["stg_devices"], c, watermark=w
            ),
            "incremental", unique_key="alert_id", watermark_col="alert_ts",
            tags=("silver", "intermediate"), schema_suffix="silver",
        ),
        ModelDef(
            "fct_hourly_metrics", ("int_device_health",),
            lambda r, c, w: M.fct_hourly_metrics(r["int_device_health"], c),
            "table", tags=("gold", "marts", "fact"), schema_suffix="gold",
        ),
        ModelDef(
            "fct_device_summary",
            ("int_sensor_readings_cleaned", "int_alerts_enriched"),
            lambda r, c, w: M.fct_device_summary(
                r["int_sensor_readings_cleaned"], r["int_alerts_enriched"], c
            ),
            "table", tags=("gold", "marts", "fact"), schema_suffix="gold",
        ),
        ModelDef(
            "fct_anomaly_events", ("int_sensor_readings_cleaned",),
            lambda r, c, w: M.fct_anomaly_events(r["int_sensor_readings_cleaned"], c),
            "table", tags=("gold", "marts", "fact"), schema_suffix="gold",
        ),
        ModelDef(
            "dim_devices", ("stg_devices", "int_sensor_readings_cleaned"),
            lambda r, c, w: M.dim_devices(
                r["stg_devices"], r["int_sensor_readings_cleaned"], c
            ),
            "table", tags=("gold", "marts", "dimension"), schema_suffix="gold",
        ),
    ]
}


def topo_order(
    models: Mapping[str, ModelDef] = MODELS, select_tags: set[str] | None = None
) -> list[str]:
    """Kahn topological sort; with tag selection, upstream deps of selected
    models are still ordered but the caller decides whether to rebuild them."""
    # in-degree counts only in-registry deps (raw sources live outside)
    indeg = {n: sum(1 for d in m.deps if d in models) for n, m in models.items()}
    order: list[str] = []
    ready = sorted(n for n, k in indeg.items() if k == 0)
    while ready:
        n = ready.pop(0)
        order.append(n)
        for m in models.values():
            if n in m.deps:
                indeg[m.name] -= 1
                if indeg[m.name] == 0:
                    ready.append(m.name)
        ready.sort()
    if len(order) != len(models):  # pragma: no cover
        raise ValueError("cycle detected in model DAG")
    if select_tags:
        order = [n for n in order if set(models[n].tags) & select_tags]
    return order
