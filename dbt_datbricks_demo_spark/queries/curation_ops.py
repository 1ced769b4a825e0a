"""Round-3 training-data curation additions.

BPE pair statistics (the adjacent-pair counting at the core of
byte-pair-encoding tokenizer training), winnowing fingerprints
(Schleimer et al. MOSS — substring-robust near-dup detection), and a
deterministic md5-keyed training-order shuffle. DuckDB oracles compute
literally the same integers (shared hash convention: first 8 md5 hex
digits as unsigned 32-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.operators import dedup
from dbt_datbricks_demo_spark.operators.text import tokens
from dbt_datbricks_demo_spark.queries.inventory import _register, _spread, _t

_SQL_TOKENS = "string_split_regex(trim(lower(text)), '\\s+')"
_SQL_H32 = "(('0x' || substr(md5({x}), 1, 8))::ubigint)::bigint"


# ---------------------------------------------------------------------------
# BPE merge-candidate statistics
# ---------------------------------------------------------------------------
@_register(
    "bpe_pair_stats",
    "Adjacent-token-pair frequencies (the BPE tokenizer-training inner "
    "loop): zip_with over offset slices -> explode -> hash agg -> "
    "top-20 with tie-break. The pair explosion is absorbed map-side by "
    "partial aggregation before the single shuffle",
    f"""
    select p as pair, count(*) as cnt
    from (
        select unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) as p
        from (select {_SQL_TOKENS} as t from documents)
    )
    group by p
    order by cnt desc, pair asc
    limit 20
    """,
)
def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = tokens("text")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS)
# ---------------------------------------------------------------------------
_K, _W = 4, 5

_SQL_WINNOW = f"""
    list_sort(list_distinct(
        case
          when len(kh) >= {_W} then
            list_transform(range(1, len(kh) - {_W - 1} + 1),
                           j -> list_min(kh[j:j + {_W - 1}]))
          when len(kh) > 0 then [list_min(kh)]
          else []
        end
    ))
"""


@_register(
    "winnow_fingerprint_report",
    "Winnowing fingerprints (Schleimer et al., MOSS): k-gram hashes -> "
    "sliding-window minima -> distinct. Guarantees shared substrings of "
    ">= w+k-1 tokens share a fingerprint at ~2/(w+1) density. Pure "
    "array expressions, zero shuffle before the final tiny agg",
    f"""
    with kg as (
        select doc_id,
               list_transform(
                   list_transform(range(1, len(t) - {_K - 1} + 1),
                                  i -> array_to_string(t[i:i + {_K - 1}], ' ')),
                   g -> {_SQL_H32.format(x='g')}
               ) as kh
        from (select doc_id, {_SQL_TOKENS} as t from documents)
    )
    select doc_id,
           len(kh)                        as n_kgrams,
           len({_SQL_WINNOW})             as n_fingerprints,
           list_min({_SQL_WINNOW})        as min_fp,
           list_max({_SQL_WINNOW})        as max_fp
    from kg
    """,
)
def winnow_fingerprint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    staged = dedup.with_winnowed_fingerprints(docs, "text", k=_K, w=_W)
    toks = tokens("text")
    return staged.select(
        "doc_id",
        F.greatest(F.size(toks) - (_K - 1), F.lit(0)).alias("n_kgrams"),
        F.size("winnow_fps").alias("n_fingerprints"),
        F.array_min("winnow_fps").alias("min_fp"),
        F.array_max("winnow_fps").alias("max_fp"),
    )


# ---------------------------------------------------------------------------
# Deterministic training-order shuffle
# ---------------------------------------------------------------------------
@_register(
    "training_order_shuffle",
    "Deterministic global training-order shuffle: md5(seed||doc_id) as "
    "the sort key — reproducible across engines/runs/partitionings, no "
    "RNG state. Top-50 via TakeOrderedAndProject (no global sort); a "
    "full epoch order is the same expression written out partitioned",
    f"""
    select doc_id,
           {_SQL_H32.format(x="'epoch1:' || cast(doc_id as varchar)")} as shuffle_key
    from documents
    order by shuffle_key asc, doc_id asc
    limit 50
    """,
)
def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    key = dedup.md5_int32(
        F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string"))
    )
    return (
        docs.select("doc_id", key.alias("shuffle_key"))
        .orderBy(F.asc("shuffle_key"), F.asc("doc_id"))
        .limit(50)
    )
