"""Bucketed tables for co-located joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
on the join key. Writing both tables bucketed (hash-partitioned into a
fixed number of files) by that key moves the shuffle to WRITE time, once;
every subsequent join/aggregation on the key reads co-located buckets
and runs with NO exchange on either side (SortMergeJoin over pre-sorted
buckets, or hash agg with no re-partition). This is the Spark-native
equivalent of the clustering the reference gets from Delta ZORDER/Liquid
Clustering (databricks_data_flow.sql:255-261, README.md:57) applied to
join locality instead of file skipping.

Rules of thumb encoded here:
  * bucket count should match downstream parallelism (a multiple of the
    cluster's cores), fixed at write time — both join sides MUST use the
    same count for exchange-free joins.
  * sortBy the bucket key so SortMergeJoin skips its sort too.
  * bucketed tables are catalog tables (the bucketing metadata lives in
    the catalog, not the parquet files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_key: str | list[str],
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize df as a catalog table bucketed (and sorted) by key."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    # hash-repartition on the bucket keys first: repartition and bucketing
    # share the same hash, so each writer task holds exactly one bucket →
    # one file per bucket. That single-file property is what lets the
    # reader trust sortBy order and drop the per-task Sort from SMJ plans.
    df = df.repartition(num_buckets, *[df[k] for k in keys])
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table — outputPartitioning carries the bucket
    spec, so joins/aggs on the bucket key plan without an Exchange."""
    return spark.table(name)


def colocated_join(
    spark: SparkSession, left_name: str, right_name: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-key same-bucket-count tables. With both sides
    bucketed, Catalyst plans a SortMergeJoin with zero exchanges — the
    plan to verify via .explain (tests/test_scale.py pins it)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return read_bucketed(spark, left_name).join(
        read_bucketed(spark, right_name), on=on_cols, how=how
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout (one directory per partition
    value). Reads that filter on the partition column prune entire
    directories BEFORE listing files — at 100 TB a day-partitioned events
    table turns a 'last 7 days' query from a full scan into 7 directory
    reads. Keep partition cardinality sane (date/region, not user_id):
    each partition should hold >= file-sized data or small files dominate."""
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    df.write.mode(mode).partitionBy(*cols).parquet(path)
