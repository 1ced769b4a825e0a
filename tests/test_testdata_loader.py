"""Guard the driver-testdata loader against parquet format drift.

Round 1's testdata wrote events.ts as TIMESTAMP(NANOS); round 2's as
timestamp[us] without tz (Spark 4: TIMESTAMP_NTZ). The latter broke
every timestamp-only function call downstream (unix_micros) and
poisoned three driver gates at once. The loader must normalize ts to
session-time TimestampType regardless of what the driver writes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from dbt_datbricks_demo_spark.sources.testdata import TABLES, load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_timestamp_type(spark, sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"events.ts loaded as {df.schema['ts'].dataType}; loader must "
        "normalize to TimestampType (session tz pinned UTC)"
    )
    # timestamp-only functions must resolve — this is exactly what broke
    # sessionize_events in round 2
    row = df.select(F.unix_micros("ts").alias("us")).first()
    assert row["us"] is not None


def test_all_tables_load(spark):
    for name in TABLES:
        df = load_table(spark, SF_DIRS[0], name)
        assert len(df.columns) > 0
