"""Typed CSV seed loading (reference operator S1).

The reference declares explicit column types for its 3 seed CSVs
(reference: seeds/schema.yml:6-43) rather than relying on inference; we do
the same with explicit StructTypes. ``varchar(n)`` maps to StringType —
Spark does not enforce length, and nothing in the reference depends on
truncation.

At scale the same loader handles any header CSV; explicit schemas avoid
the full-file inference pass Spark would otherwise run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


# reference: seeds/schema.yml:6-43
SEED_SCHEMAS: dict[str, StructType] = {
    "raw_sensor_readings": _st(
        ("reading_id", StringType()),
        ("device_id", StringType()),
        ("metric_name", StringType()),
        ("metric_value", DoubleType()),
        ("reading_ts", TimestampType()),
        ("ingested_at", TimestampType()),
    ),
    "raw_devices": _st(
        ("device_id", StringType()),
        ("device_name", StringType()),
        ("device_type", StringType()),
        ("location", StringType()),
        ("zone", StringType()),
        ("install_date", DateType()),
        ("manufacturer", StringType()),
        ("firmware_version", StringType()),
        ("is_active", BooleanType()),
    ),
    "raw_alerts": _st(
        ("alert_id", StringType()),
        ("device_id", StringType()),
        ("alert_type", StringType()),
        ("severity", StringType()),
        ("metric_name", StringType()),
        ("threshold_value", DoubleType()),
        ("actual_value", DoubleType()),
        ("alert_ts", TimestampType()),
        ("resolved_at", TimestampType()),
        ("resolution_notes", StringType()),
    ),
}


def load_seed(spark: SparkSession, seeds_dir: str, name: str) -> DataFrame:
    """Load one seed CSV with its declared schema.

    Empty CSV fields become proper nulls (``nullValue=""``), matching the
    agate/dbt seed semantics where blank metric_value / resolved_at load
    as NULL (reference fixture rows R169/R183, unresolved alerts).
    """
    path = os.path.join(seeds_dir, f"{name}.csv")
    return spark.read.csv(
        path,
        header=True,
        schema=SEED_SCHEMAS[name],
        nullValue="",
        timestampFormat="yyyy-MM-dd HH:mm:ss",
        dateFormat="yyyy-MM-dd",
    )


def load_seeds(spark: SparkSession, seeds_dir: str) -> dict[str, DataFrame]:
    return {name: load_seed(spark, seeds_dir, name) for name in SEED_SCHEMAS}
