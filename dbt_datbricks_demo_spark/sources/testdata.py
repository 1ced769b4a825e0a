"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; transparently handles TIMESTAMP(NANOS) parquet.

    events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    natively (PARQUET_TYPE_ILLEGAL). We read it as epoch-nanos long
    (legacy.parquet.nanosAsLong — runtime-settable) and convert to a
    microsecond TimestampType; sub-µs precision is dropped, matching
    Spark's native timestamp resolution.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # parquet TIMESTAMP(NANOS): epoch-nanos long -> micros
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # parquet timestamp[us] without tz loads as TIMESTAMP_NTZ in
            # Spark 4; normalize to session-time TimestampType so
            # timestamp-only functions (unix_micros, ...) resolve. The
            # session timezone is pinned UTC (session.py), so the cast is
            # value-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view of the same name."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
