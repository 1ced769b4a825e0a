"""Scale-out operators beyond the reference's surface.

The reference is a classic relational ELT project; a 100 TB training-data
pipeline additionally needs deduplication, similarity search, text
analysis, and multimodal column handling (BASELINE.json north star).
These are implemented Spark-first: JVM-side built-in expressions
(transform/aggregate/array_min over arrays — whole-stage codegen) for
everything hash/token shaped, Arrow-batched pandas UDFs only where
genuinely needed (multimodal decode).
"""

from dbt_datbricks_demo_spark.operators import (  # noqa: F401
    asof,
    corpus,
    dedup,
    embeddings,
    multimodal,
    rangejoin,
    similarity,
    skew,
    text,
)
