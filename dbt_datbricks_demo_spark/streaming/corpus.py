"""Streaming corpus ingestion — the LLM-pipeline analog of the
bronze→silver sensor stream: JSONL documents arrive as files, are
exact-deduplicated against every document ever seen, quality/language
gated, and appended to the training corpus.

    batch operator (operators/corpus.py)   streaming equivalent
    -------------------------------------  ---------------------------------
    exact_dedup (groupBy content hash)     dropDuplicates on content hash —
                                           state keyed by 16-byte digest,
                                           not document bodies
    quality / language gates               same narrow expressions, per
                                           micro-batch
    corpus write                           append-mode file sink

State note: exact dedup against ALL history needs one state entry per
distinct content hash ever seen (16-byte key + overhead). At 10¹¹ docs
that is executor-distributed RocksDB territory, and the practical
alternative is watermarked dedup (bounded horizon) + a periodic batch
compaction — both expressible here by adding withWatermark before the
dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dbt_datbricks_demo_spark.operators import dedup, text

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def read_document_stream(
    spark: SparkSession, input_dir: str, schema: StructType = DOC_SCHEMA
) -> DataFrame:
    """JSONL file stream: new files become micro-batches; malformed
    lines are dropped at parse (mirrors sources/corpus_io.py)."""
    return (
        spark.readStream.schema(schema)
        .option("mode", "DROPMALFORMED")
        .option("maxFilesPerTrigger", 1)
        .json(input_dir)
    )


def corpus_stream_cleaned(
    stream: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    allowed_langs: tuple[str, ...] = ("en", "de", "es", "fr"),
) -> DataFrame:
    """Cross-batch exact dedup + quality/language gates. The dedup state
    key is the md5 digest — document bodies never enter the state store."""
    hashed = stream.withColumn("content_hash", dedup.content_hash(text_col))
    deduped = hashed.dropDuplicates(["content_hash"])
    return deduped.filter(
        (F.size(text.tokens(text_col)) >= min_tokens)
        & text.predict_lang(text_col).isin(*allowed_langs)
    )


def write_corpus_append(
    cleaned: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Append-mode parquet sink: each micro-batch's surviving documents
    join the corpus; exactly-once via the checkpoint."""
    return (
        cleaned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
