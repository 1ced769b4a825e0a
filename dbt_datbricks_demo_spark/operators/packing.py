"""Sequence packing: lay documents end-to-end into fixed token-budget
training chunks (the GPT-style pre-training batcher — concatenate the
token stream, cut every `budget` tokens; documents may straddle a cut).

Spark-first design: a true greedy bin packer is a sequential recurrence,
but stream-chunking is pure prefix-sum arithmetic, which IS expressible
as window math — and it is what large-scale trainers actually do. The
corpus is split into `n_buckets` deterministic md5 streams; within each
stream a running token offset (window cumsum ordered by id) places every
document at [start, end), and the chunks it covers are
floor(start/budget) … floor((end-1)/budget) — emitted via
sequence()+explode, all JVM expression code.

Scale: the only exchange is the hash partition on the bucket id; each
window runs inside its own stream partition — NO single-partition global
window (same discipline as operators.ranking). At 100 TB you pick
n_buckets ≈ cluster parallelism; each stream is an independent
concatenation order, which is exactly how multi-worker data loaders
shard anyway. Determinism: md5 bucketing + (id) ordering makes every
(engine, partitioning, run) produce byte-identical chunk assignments.

Reference parity: not in the reference (IoT demo); part of the
training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5_bucket(id_col: str, n_buckets: int, salt: str):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % n_buckets
    )


def pack_chunks(
    df: DataFrame,
    token_count_col: str,
    id_col: str = "doc_id",
    budget: int = 256,
    n_buckets: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Assign every document to the training chunk(s) it occupies.

    Returns one row per (document × chunk it touches):
    bucket, chunk_id, id, chunk_tokens (this doc's tokens inside that
    chunk), doc_start (offset of the doc's first token within the
    chunk). sum(chunk_tokens) per (bucket, chunk_id) == budget for every
    full chunk; a document longer than `budget` spans multiple chunks.
    """
    w = (
        Window.partitionBy("_pack_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).cast("bigint")
    placed = (
        df.withColumn("_pack_bucket", _md5_bucket(id_col, n_buckets, salt))
        .withColumn("_start", start)
        .withColumn("_end", (F.col("_start") + F.col(token_count_col)).cast("bigint"))
    )
    first_chunk = F.floor(F.col("_start") / budget)
    last_chunk = F.floor((F.col("_end") - 1) / budget)
    exploded = placed.filter(F.col(token_count_col) > 0).select(
        F.col("_pack_bucket").alias("bucket"),
        F.col(id_col),
        F.col("_start"),
        F.col("_end"),
        F.explode(F.sequence(first_chunk, last_chunk)).alias("chunk_id"),
    )
    lo = F.greatest(F.col("_start"), F.col("chunk_id") * budget)
    hi = F.least(F.col("_end"), (F.col("chunk_id") + 1) * budget)
    return exploded.select(
        "bucket",
        "chunk_id",
        id_col,
        (hi - lo).alias("chunk_tokens"),
        (lo - F.col("chunk_id") * budget).alias("doc_start"),
        (F.col("_start") < F.col("chunk_id") * budget).alias("continues"),
    )


def chunk_report(
    df: DataFrame,
    token_count_col: str,
    id_col: str = "doc_id",
    budget: int = 256,
    n_buckets: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Per-chunk packing summary: documents per chunk, token fill, and
    how many documents straddle the chunk's leading boundary. Every
    chunk except each stream's tail must show fill == budget."""
    packed = pack_chunks(
        df, token_count_col, id_col=id_col, budget=budget,
        n_buckets=n_buckets, salt=salt,
    )
    return packed.groupBy("bucket", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("chunk_tokens").cast("bigint").alias("fill_tokens"),
        F.sum(F.col("continues").cast("bigint")).cast("bigint").alias("n_continued"),
    )
