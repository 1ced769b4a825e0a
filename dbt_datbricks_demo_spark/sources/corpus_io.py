"""JSONL corpus interchange — the lingua franca of training-data
pipelines (one JSON document per line, gzip-friendly, splittable when
uncompressed).

Spark's json source handles this natively; these helpers pin the
settings that matter at scale: an EXPLICIT schema (schema inference
costs a full extra pass over 100 TB), permissive mode with a corrupt
record column (a bad line must not kill a day-long job), and
partition-count control on write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL with a declared schema. Default: malformed lines are
    dropped at parse (DROPMALFORMED — no corrupt column, so downstream
    count()/filter queries never hit Spark's corrupt-column-only query
    restriction). keep_corrupt=True switches to PERMISSIVE with the bad
    line preserved in _corrupt_record for quarantine pipelines."""
    if not keep_corrupt:
        return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    full = StructType(schema.fields + [StructField(CORRUPT_COL, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_jsonl(
    df: DataFrame, path: str, num_files: int | None = None, mode: str = "overwrite"
) -> None:
    """Write JSONL; num_files coalesces for interchange-friendly file
    counts (None keeps the plan's partitioning — the right choice for
    big outputs)."""
    out = df.coalesce(num_files) if num_files else df
    out.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read ORC (Spark-native columnar source, no extra jars). Schema
    optional — ORC files self-describe — but pinning one skips footer
    inference over a large file listing and catches drift at read time.
    Predicate pushdown / column pruning work as for parquet (plan-pinned
    in tests/test_maintenance.py round-trip)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    num_files: int | None = None,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write ORC with optional hive partitioning; num_files coalesces
    for interchange-friendly file counts (None keeps the plan's
    partitioning). zlib is Spark's ORC default codec — splittable and
    universally readable; switch via spark.sql.orc.compression.codec."""
    out = df.coalesce(num_files) if num_files else df
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
