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

from dbt_datbricks_demo_spark.functions import literal_df
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


# ---------------------------------------------------------------------------
# Ordered-funnel analysis (sequential pattern matching, one shuffle)
# ---------------------------------------------------------------------------
@_register(
    "funnel_report",
    "view→click→purchase ordered funnel in ONE shuffle: per-user sorted "
    "event sequence folded to a funnel level by an in-plan aggregate() "
    "state machine (level advances only on the next required step) — no "
    "N-way self-join per funnel stage, no driver loop. The oracle "
    "derives the SAME semantics via chained first-step-after "
    "aggregations with (ts, event_type) row-value comparisons — the "
    "exact tie order of the Spark fold's struct sort — instead of "
    "DuckDB's list_reduce: at x100 (15M events) DuckDB 1.0's "
    "transform+reduce over struct-derived lists returned a DIFFERENT "
    "level sum on every run (measured 449,937 / 449,940 / 449,959 on "
    "identical deterministically-sorted inputs; the sorted-sequence "
    "hash was run-stable, isolating the bug to the lambda reduce), so "
    "the lambda pipeline is unusable as an oracle at scale. The "
    "independent formulation is also a stronger check than re-running "
    "the identical fold",
    """
    with u as (select count(distinct user_id) as n from events),
    v as (
        select user_id, min(ts) as vts from events
        where event_type = 'view' group by user_id
    ),
    c as (
        select e.user_id, min(e.ts) as cts
        from events e join v using (user_id)
        where e.event_type = 'click'
          and (e.ts, e.event_type) > (v.vts, 'view')
        group by e.user_id
    ),
    p as (
        select e.user_id, min(e.ts) as pts
        from events e join c using (user_id)
        where e.event_type = 'purchase'
          and (e.ts, e.event_type) > (c.cts, 'click')
        group by e.user_id
    )
    select
        (select n from u)                  as n_users,
        (select count(*) from v)           as reached_view,
        (select count(*) from c)           as reached_click,
        (select count(*) from p)           as reached_purchase
    """,
)
def funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _spread(_t(spark, sf_dir, "events"))
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ts"), F.col("event_type").alias("t")))
        ).alias("s")
    )
    codes = F.transform(
        F.col("s"),
        lambda e: F.when(e.t == "view", 1)
        .when(e.t == "click", 2)
        .when(e.t == "purchase", 3)
        .otherwise(0),
    )
    level = F.aggregate(
        codes,
        F.lit(0),
        lambda acc, x: F.when(x == acc + 1, acc + 1).otherwise(acc),
    )
    return seq.select(level.alias("level")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count_if(F.col("level") >= 1).alias("reached_view"),
        F.count_if(F.col("level") >= 2).alias("reached_click"),
        F.count_if(F.col("level") >= 3).alias("reached_purchase"),
    )


# ---------------------------------------------------------------------------
# RAG-style overlapping chunking
# ---------------------------------------------------------------------------
_CHUNK_N, _CHUNK_STRIDE = 64, 48


@_register(
    "chunk_overlap_report",
    "overlapping token chunking (RAG/window preprocessing): chunk "
    "starts generated in-plan (sequence with stride), slices hashed for "
    "content identity — narrow map + explode, the chunk explosion never "
    "carries document bodies across a shuffle",
    f"""
    select doc_id,
           cast(i as bigint)                         as chunk_idx,
           cast(len(t[i:i + {_CHUNK_N - 1}]) as bigint) as n_tokens,
           md5(array_to_string(t[i:i + {_CHUNK_N - 1}], ' ')) as chunk_md5
    from (
        select doc_id, t, unnest(range(1, len(t) + 1, {_CHUNK_STRIDE})) as i
        from (select doc_id, {_SQL_TOKENS} as t from documents)
    )
    """,
)
def chunk_overlap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = tokens("text")
    staged = docs.select("doc_id", toks.alias("t"))
    starts = F.sequence(F.lit(1), F.size("t"), F.lit(_CHUNK_STRIDE))
    exploded = staged.select(
        "doc_id", "t", F.explode(starts).alias("i")
    )
    chunk = F.slice(F.col("t"), F.col("i"), _CHUNK_N)
    return exploded.select(
        "doc_id",
        F.col("i").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# Winnowing candidate pairs (substring-level near-dup detection)
# ---------------------------------------------------------------------------
_WINNOW_MIN_SHARED = 3
_WINNOW_MAX_DF = 50  # stop-fingerprint cap: drop fps present in > this many docs


@_register(
    "winnow_candidate_pairs",
    "substring near-dup candidates from shared winnowing fingerprints: "
    "explode (doc, fp) carrying the doc's fp-count inline (no extra "
    "size join), drop stop-fingerprints (df cap — the hot-bucket "
    "defense, same as LSH), self-join on fp, pairs with >= 3 shared "
    "fps scored by containment. Only ids+hashes shuffle, never text",
    f"""
    with fps as (
        select doc_id, len(w) as nfp, unnest(w) as fp
        from (
            select doc_id,
                   list_sort(list_distinct(
                       case
                         when len(kh) >= {_W} then
                           list_transform(range(1, len(kh) - {_W - 1} + 1),
                                          j -> list_min(kh[j:j + {_W - 1}]))
                         when len(kh) > 0 then [list_min(kh)]
                         else []
                       end
                   )) as w
            from (
                select doc_id,
                       list_transform(
                           list_transform(range(1, len(t) - {_K - 1} + 1),
                                          i -> array_to_string(t[i:i + {_K - 1}], ' ')),
                           g -> {_SQL_H32.format(x='g')}
                       ) as kh
                from (select doc_id, {_SQL_TOKENS} as t from documents)
            )
        )
    ),
    live as (
        select * from fps
        where fp in (
            select fp from fps group by fp having count(*) <= {_WINNOW_MAX_DF}
        )
    ),
    pairs as (
        select a.doc_id as id_a, b.doc_id as id_b,
               count(*) as n_shared,
               min(a.nfp) as nfp_a, min(b.nfp) as nfp_b
        from live a join live b on a.fp = b.fp and a.doc_id < b.doc_id
        group by a.doc_id, b.doc_id
    )
    select id_a, id_b, n_shared,
           round(n_shared * 1.0 / least(nfp_a, nfp_b), 6) as containment
    from pairs
    where n_shared >= {_WINNOW_MIN_SHARED}
    """,
)
def winnow_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    staged = dedup.with_winnowed_fingerprints(docs, "text", k=_K, w=_W)
    # the k-gram hash + sliding-min fingerprint pass is the expensive
    # stage and THREE consumers read it (the df cap and both self-join
    # sides): materialize the narrow (doc_id, nfp, fp) rows once
    # instead of recomputing the fingerprints per branch
    fps = staged.select(
        "doc_id",
        F.size("winnow_fps").alias("nfp"),
        F.explode("winnow_fps").alias("fp"),
    ).localCheckpoint(eager=True)
    # stop-fingerprint cap: a fingerprint shared by half the corpus is a
    # boilerplate phrase, and its bucket would be a quadratic hot spot
    df_counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    live = fps.join(
        df_counts.filter(F.col("df") <= _WINNOW_MAX_DF).select("fp"), "fp"
    )
    a = live.select(
        F.col("doc_id").alias("id_a"), F.col("nfp").alias("nfp_a"), "fp"
    )
    b = live.select(
        F.col("doc_id").alias("id_b"), F.col("nfp").alias("nfp_b"), "fp"
    )
    pairs = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.min("nfp_a").alias("nfp_a"),
            F.min("nfp_b").alias("nfp_b"),
        )
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )
    return pairs.select(
        "id_a",
        "id_b",
        "n_shared",
        F.round(
            F.col("n_shared") * 1.0 / F.least("nfp_a", "nfp_b"), 6
        ).alias("containment"),
    )


# ---------------------------------------------------------------------------
# Cohort retention (classic event analytics)
# ---------------------------------------------------------------------------
@_register(
    "retention_cohorts",
    "weekly cohort retention triangle: cohort = each user's first "
    "activity week (one hash agg), then distinct users per (cohort, "
    "weeks-since) — two shuffles total, the user->cohort map rejoins "
    "the events co-partitioned on user_id; no per-cohort self-joins",
    """
    with firstw as (
        select user_id,
               min(cast(date_trunc('week', ts) as date)) as cohort_week
        from events
        group by user_id
    ),
    act as (
        select e.user_id,
               f.cohort_week,
               cast(floor(date_diff('day', f.cohort_week,
                                    cast(date_trunc('week', e.ts) as date)) / 7)
                    as bigint) as weeks_since
        from events e join firstw f using (user_id)
    )
    select cohort_week, weeks_since,
           count(distinct user_id) as active_users
    from act
    group by cohort_week, weeks_since
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _spread(_t(spark, sf_dir, "events"))
    week = F.to_date(F.date_trunc("week", "ts"))
    firstw = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    act = ev.join(firstw, "user_id").select(
        "user_id",
        "cohort_week",
        F.floor(F.datediff(week, F.col("cohort_week")) / 7)
        .cast("bigint")
        .alias("weeks_since"),
    )
    return act.groupBy("cohort_week", "weeks_since").agg(
        F.countDistinct("user_id").alias("active_users")
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization (ANN memory-footprint path)
# ---------------------------------------------------------------------------
@_register(
    "embedding_quantization_report",
    "symmetric int8 quantization of embeddings (4x memory cut for ANN "
    "serving): per-vector max-abs scale, round-half-up to int8, "
    "reconstruction error via one aggregate() fold — pure array math, "
    "zero shuffle, zero Python",
    """
    select vec_id,
           round(scale, 6) as scale6,
           list_transform(q, x -> cast(x as bigint))[1:8] as q_head,
           round(list_sum(list_transform(
               list_zip(embedding, q),
               p -> abs(cast(p[1] as double) - cast(p[2] as double) * scale)
           )) / len(embedding), 6) as mean_abs_err
    from (
        select vec_id, embedding,
               list_max(list_transform(embedding,
                                       x -> abs(cast(x as double)))) / 127.0
                   as scale,
               list_transform(
                   embedding,
                   x -> cast(floor(cast(x as double)
                             / (list_max(list_transform(embedding,
                                    y -> abs(cast(y as double)))) / 127.0)
                             + 0.5) as bigint)
               ) as q
        from embeddings
    )
    """,
)
def embedding_quantization_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _spread(_t(spark, sf_dir, "embeddings"))
    absd = F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    staged = emb.select(
        "vec_id",
        "embedding",
        (F.array_max(absd) / F.lit(127.0)).alias("scale"),
    )
    # round-half-up spelled as floor(x/scale + 0.5): identical in both
    # engines (DuckDB round() is half-up but Spark's is half-even for
    # doubles — the explicit floor form sidesteps the difference)
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    staged2 = staged.withColumn("q", q)
    err = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("q"),
            lambda e, qq: F.abs(e.cast("double") - qq.cast("double") * F.col("scale")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size("embedding")
    return staged2.select(
        "vec_id",
        F.round("scale", 6).alias("scale6"),
        F.slice("q", 1, 8).alias("q_head"),
        F.round(err, 6).alias("mean_abs_err"),
    )


# ---------------------------------------------------------------------------
# Time-series gap fill + interpolation (hypertable-style)
# ---------------------------------------------------------------------------
@_register(
    "gap_fill_interpolate",
    "TimescaleDB-style time_bucket_gapfill + locf + interpolate: per-"
    "user hourly spine generated in-plan, observed hourly event counts "
    "joined co-partitioned, forward fill and linear interpolation via "
    "IGNORE NULLS window frames with exact epoch-second fractions "
    "(operators.timeseries.gap_fill)",
    """
    with hourly as (
        select user_id,
               date_trunc('hour', ts) as hour,
               cast(count(*) as double) as v
        from events
        group by 1, 2
    ),
    bounds as (
        select user_id, min(hour) as lo, max(hour) as hi from hourly group by 1
    ),
    spine as (
        select user_id,
               unnest(generate_series(lo, hi, interval 1 hour)) as hour
        from bounds
    ),
    j as (
        select s.user_id, s.hour, h.v
        from spine s left join hourly h using (user_id, hour)
    ),
    w as (
        select user_id, hour, v,
            last_value(v ignore nulls) over
                (partition by user_id order by hour
                 rows between unbounded preceding and current row) as v_prev,
            last_value(case when v is not null then epoch(hour) end ignore nulls)
                over (partition by user_id order by hour
                      rows between unbounded preceding and current row) as t_prev,
            first_value(v ignore nulls) over
                (partition by user_id order by hour
                 rows between 1 following and unbounded following) as v_next,
            first_value(case when v is not null then epoch(hour) end ignore nulls)
                over (partition by user_id order by hour
                      rows between 1 following and unbounded following) as t_next
        from j
    )
    select user_id,
           cast(hour as timestamp) as hour,
           v is not null           as known,
           v_prev                  as ffill,
           round(case when v is not null then v
                      when v_prev is not null and v_next is not null then
                          v_prev + (v_next - v_prev)
                                 * (epoch(hour) - t_prev) / (t_next - t_prev)
                      when v_prev is not null then v_prev
                      else v_next end, 6) as interp
    from w
    """,
)
def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_datbricks_demo_spark.operators import timeseries

    ev = _spread(_t(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    return timeseries.gap_fill(hourly, "user_id", "hour", "v")


# ---------------------------------------------------------------------------
# Vocabulary OOV rate (tokenizer coverage metric)
# ---------------------------------------------------------------------------
_VOCAB_K = 50


@_register(
    "oov_rate_report",
    "out-of-vocabulary rate per source against the corpus top-50 "
    "vocabulary: vocab built in-plan (one agg + top-k), token stream "
    "left-anti-checked against it via a broadcast join — the coverage "
    "metric a tokenizer/vocab decision is made on. Per-source exact "
    "int counts, one ratio at the edge",
    f"""
    with toks as (
        select source, unnest({_SQL_TOKENS}) as t from documents
    ),
    vocab as (
        select t from toks where t <> ''
        group by t
        order by count(*) desc, t asc
        limit {_VOCAB_K}
    )
    select source,
           count(*)                                        as n_tokens,
           count(*) filter (where t not in (select t from vocab))
                                                           as n_oov,
           round(count(*) filter (where t not in (select t from vocab))
                 * 1.0 / count(*), 6)                      as oov_rate
    from toks
    where t <> ''
    group by source
    """,
)
def oov_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        "source", F.explode(tokens("text")).alias("t")
    ).filter(F.col("t") != "")
    vocab = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("t"))
        .limit(_VOCAB_K)
        .select("t", F.lit(True).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_if(F.col("_in_vocab").isNull()).alias("n_oov"),
            F.round(
                F.count_if(F.col("_in_vocab").isNull()) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Population stability index (distribution drift between splits)
# ---------------------------------------------------------------------------
_PSI_BINS = 10
_PSI_LO, _PSI_HI = 0, 2000  # n_chars range


@_register(
    "psi_drift_report",
    "population stability index between the train and test splits over "
    "the n_chars distribution: equal-width bins, per-bin (p-q)*ln(p/q) "
    "from exact integer counts, zero-count bins Laplace-smoothed — the "
    "standard drift gate run before shipping a data refresh. Two tiny "
    "apply-side aggs; no row data leaves the bin histogram",
    f"""
    with assigned as (
        select n_chars,
               case when ('0x' || substr(md5('split:' || cast(doc_id as varchar)), 1, 8))::ubigint % 10 < 8
                    then 'train' else 'test' end as split
        from documents
    ),
    binned as (
        select split,
               least(greatest(cast(floor((n_chars - {_PSI_LO}) * {_PSI_BINS}
                                          / ({_PSI_HI} - {_PSI_LO})) as bigint),
                              0), {_PSI_BINS - 1}) as bin,
               count(*) as c
        from assigned
        group by 1, 2
    ),
    tot as (select split, sum(c) as n from binned group by 1),
    p as (
        select b.bin,
               (coalesce(max(case when b.split = 'train' then b.c end), 0) + 1.0)
                 / (max(case when t.split = 'train' then t.n end) + {_PSI_BINS})
                   as p_train,
               (coalesce(max(case when b.split = 'test' then b.c end), 0) + 1.0)
                 / (max(case when t.split = 'test' then t.n end) + {_PSI_BINS})
                   as p_test
        from binned b cross join tot t
        group by b.bin
    )
    select cast(count(*) as bigint) as n_bins,
           round(sum((p_train - p_test) * ln(p_train / p_test)), 6) as psi
    from p
    """,
)
def psi_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    split = F.when(
        dedup.md5_int32(
            F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
        )
        % 10
        < 8,
        "train",
    ).otherwise("test")
    width = _PSI_HI - _PSI_LO
    bin_col = F.least(
        F.greatest(
            F.floor((F.col("n_chars") - _PSI_LO) * _PSI_BINS / width).cast(
                "bigint"
            ),
            F.lit(0),
        ),
        F.lit(_PSI_BINS - 1),
    )
    binned = (
        docs.select(split.alias("split"), bin_col.alias("bin"))
        .groupBy("split", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # totals as a 1-row broadcast (NOT a per-split join: a bin present in
    # only one split would otherwise see a NULL denominator for the other)
    tot = binned.groupBy().agg(
        F.sum(F.when(F.col("split") == "train", F.col("c"))).alias("n_train"),
        F.sum(F.when(F.col("split") == "test", F.col("c"))).alias("n_test"),
    )
    p = (
        binned.crossJoin(F.broadcast(tot))
        .groupBy("bin")
        .agg(
            (
                (
                    F.coalesce(
                        F.max(F.when(F.col("split") == "train", F.col("c"))),
                        F.lit(0),
                    )
                    + 1.0
                )
                / (F.max("n_train") + F.lit(_PSI_BINS))
            ).alias("p_train"),
            (
                (
                    F.coalesce(
                        F.max(F.when(F.col("split") == "test", F.col("c"))),
                        F.lit(0),
                    )
                    + 1.0
                )
                / (F.max("n_test") + F.lit(_PSI_BINS))
            ).alias("p_test"),
        )
    )
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.round(
            F.sum(
                (F.col("p_train") - F.col("p_test"))
                * F.log(F.col("p_train") / F.col("p_test"))
            ),
            6,
        ).alias("psi"),
    )


# ---------------------------------------------------------------------------
# Domain/host-level curation (round 5): the RefinedWeb-style surface —
# per-domain document caps, host blocklist filtering, per-domain quality
# rollup. The documents table's `source` column is the host/domain key.
# ---------------------------------------------------------------------------
_DOMAIN_CAP = 10
_BLOCKED_DOMAINS = ["src3", "src7", "src11", "src15"]
_BLOCKED_TERM = "dup"


@_register(
    "domain_cap_report",
    "per-domain document cap (RefinedWeb-style: keep the top "
    f"{_DOMAIN_CAP} docs per domain by (n_chars desc, doc_id)): the "
    "kept set ranks with row_number + an immediate rank filter, which "
    "Spark compiles to WindowGroupLimit — each map task forwards only "
    "its per-domain top-K BEFORE the exchange, so a hot domain with "
    "100M docs never sorts corpus-wide; totals come from a separate "
    "combiner-safe groupBy joined back on source WITHOUT a broadcast "
    "hint — the domain dimension is ~1e8 registered hosts at crawl "
    "scale, so a forced O(domains) broadcast is a driver-OOM shape; "
    "both sides are already aggregated to |domains| rows, a shuffle "
    "join on source is cheap, and AQE still picks broadcast when the "
    "measured side is actually small (round-5 verdict nit #1)",
    f"""
    with ranked as (
        select source, doc_id, n_chars, len({_SQL_TOKENS}) as ntok,
               row_number() over (partition by source
                                  order by n_chars desc, doc_id) as rn
        from documents
    ),
    totals as (
        select source, count(*) as n_docs, sum(ntok) as tokens_total
        from ranked group by source
    ),
    kept as (
        select source, count(*) as n_kept, sum(ntok) as tokens_kept,
               sum(n_chars) as chars_kept
        from ranked where rn <= {_DOMAIN_CAP} group by source
    )
    select t.source,
           cast(t.n_docs as bigint) as n_docs,
           cast(k.n_kept as bigint) as n_kept,
           cast(t.n_docs - k.n_kept as bigint) as n_dropped,
           cast(t.tokens_total as bigint) as tokens_total,
           cast(k.tokens_kept as bigint) as tokens_kept,
           cast(k.chars_kept as bigint) as chars_kept
    from totals t join kept k using (source)
    order by t.source
    """,
)
def domain_cap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _spread(_t(spark, sf_dir, "documents"))
    ntok = F.size(tokens("text"))
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    kept = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _DOMAIN_CAP)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum(ntok).cast("bigint").alias("tokens_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        )
    )
    totals = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(ntok).cast("bigint").alias("tokens_total"),
    )
    # NO broadcast hint: `kept` is O(|domains|) — ~1e8 rows at real crawl
    # scale, far past the driver ceiling. Both sides are post-aggregate
    # |domains|-row relations, so the shuffle join on source is cheap and
    # AQE demotes/promotes to broadcast from MEASURED sizes at runtime.
    return (
        totals.join(kept, "source")
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).cast("bigint").alias(
                "n_dropped"
            ),
            "tokens_total",
            "tokens_kept",
            "chars_kept",
        )
        .orderBy("source")
    )


@_register(
    "domain_blocklist_report",
    "host blocklist + banned-term admission funnel: the blocklist is a "
    "TABLE joined broadcast-left (a production blocklist is millions of "
    "hosts — never an isin literal), the term check is an exact token "
    "membership test (array_contains — no regex-dialect divergence); "
    "per-domain funnel counts (domain-blocked wins over term-blocked)",
    f"""
    with blk as (
        select unnest(['{"','".join(_BLOCKED_DOMAINS)}']) as b_source
    ),
    f as (
        select d.source,
               (b.b_source is not null) as db,
               list_contains({_SQL_TOKENS}, '{_BLOCKED_TERM}') as tb
        from documents d left join blk b on d.source = b.b_source
    )
    select source,
           cast(count(*) as bigint) as n_docs,
           cast(sum(case when db then 1 else 0 end) as bigint)
               as n_domain_blocked,
           cast(sum(case when not db and tb then 1 else 0 end) as bigint)
               as n_term_blocked,
           cast(sum(case when not db and not tb then 1 else 0 end) as bigint)
               as n_admitted
    from f
    group by source
    order by source
    """,
)
def domain_blocklist_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    # pure-JVM literal relation — createDataFrame over a Python list
    # plans a PythonRDD whose 32 parallelize partitions each spin a
    # Python worker (round 13, guide §4)
    blk = literal_df(
        spark, [(s,) for s in _BLOCKED_DOMAINS], "b_source string"
    )
    flagged = (
        docs.join(
            F.broadcast(blk), docs["source"] == blk["b_source"], "left"
        )
        .withColumn("db", F.col("b_source").isNotNull())
        .withColumn("tb", F.array_contains(tokens("text"), _BLOCKED_TERM))
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("db"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_domain_blocked"),
            F.sum(F.when(~F.col("db") & F.col("tb"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_term_blocked"),
            F.sum(F.when(~F.col("db") & ~F.col("tb"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_admitted"),
        )
        .orderBy("source")
    )


@_register(
    "domain_quality_rollup",
    "per-domain corpus quality rollup: doc counts, exact-digest unique "
    "share (domain-level dup rate), language diversity, token mass, "
    "short-doc share, and a quality tier CASE over the mean doc length "
    "— the per-host scorecard a crawl-curation pipeline keeps; one "
    "combiner-safe aggregation pass, distinct counts partial-agged on "
    "(source, value)",
    f"""
    with d as (
        select source, lang, md5(text) as digest,
               len({_SQL_TOKENS}) as ntok
        from documents
    )
    select source,
           cast(count(*) as bigint) as n_docs,
           cast(count(distinct digest) as bigint) as n_unique,
           cast(count(distinct lang) as bigint) as n_langs,
           cast(sum(ntok) as bigint) as tokens_total,
           cast(sum(case when ntok < 30 then 1 else 0 end) as bigint)
               as n_short_docs,
           sum(ntok) * 1.0 / count(*) as mean_doc_tokens,
           case when sum(ntok) * 1.0 / count(*) >= 60 then 'long'
                when sum(ntok) * 1.0 / count(*) >= 40 then 'medium'
                else 'short' end as length_tier
    from d
    group by source
    order by source
    """,
)
def domain_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    ntok = F.size(tokens("text"))
    # two countDistinct inside the main groupBy would plan the Expand
    # shape — every CORPUS row duplicated once per distinct group (the
    # round-7 table_profile fix, applied here too: aggregate each
    # distinct separately as a two-level hash agg, join on the tiny
    # source key). The digest relation is checkpointed so the md5 pass
    # runs once for both distinct branches.
    d = docs.select(
        "source", "lang", F.md5("text").alias("digest"), ntok.alias("ntok")
    ).localCheckpoint(eager=True)
    mean_tokens = F.sum("ntok") * 1.0 / F.count(F.lit(1))
    base = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ntok").cast("bigint").alias("tokens_total"),
        F.sum(F.when(F.col("ntok") < 30, 1).otherwise(0))
        .cast("bigint")
        .alias("n_short_docs"),
        mean_tokens.alias("mean_doc_tokens"),
        F.when(mean_tokens >= 60, "long")
        .when(mean_tokens >= 40, "medium")
        .otherwise("short")
        .alias("length_tier"),
    )
    uniq = d.groupBy("source").agg(
        F.countDistinct("digest").cast("bigint").alias("n_unique")
    )
    langs = d.groupBy("source").agg(
        F.countDistinct("lang").cast("bigint").alias("n_langs")
    )
    return (
        base.join(F.broadcast(uniq), "source")
        .join(F.broadcast(langs), "source")
        .select(
            "source", "n_docs", "n_unique", "n_langs", "tokens_total",
            "n_short_docs", "mean_doc_tokens", "length_tier",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters (frequent-token estimation)
# ---------------------------------------------------------------------------
_CM_D = 4       # sketch rows (independent hash functions)
_CM_W = 1024    # buckets per row

_SQL_CM_EXPAND = " union all ".join(
    f"select token, cnt, {j} as j,"
    f" ('0x' || substr(md5('{j}:' || token), 1, 8))::ubigint % {_CM_W}"
    f" as bucket from vocab"
    for j in range(_CM_D)
)


@_register(
    "heavy_hitters_report",
    "count-min-sketch heavy hitters: the corpus token stream folds into "
    f"a FIXED {_CM_D}x{_CM_W} counter table (the O(1)-memory frequent-"
    "items structure — Cormode & Muthukrishnan 2005); the exact top-20 "
    "tokens are estimated back out of the sketch (min over rows) with "
    "the overestimate measured in-result. The sketch is hash-"
    "deterministic, so DuckDB reproduces every estimate EXACTLY — a "
    "full value-hash oracle, no tolerance band needed",
    f"""
    with vocab as (
        select t as token, count(*) as cnt
        from (select unnest({_SQL_TOKENS}) as t from documents)
        where t <> ''
        group by t
    ),
    expanded as ({_SQL_CM_EXPAND}),
    sketch as (
        select j, bucket, sum(cnt) as c
        from expanded
        group by 1, 2
    ),
    top20 as (
        select token, cnt from vocab
        order by cnt desc, token asc limit 20
    ),
    est as (
        select t.token, t.cnt, min(s.c) as cm_est
        from ({_SQL_CM_EXPAND.replace('vocab', 'top20')}) t
        join sketch s on s.j = t.j and s.bucket = t.bucket
        group by t.token, t.cnt
    )
    select token,
           cast(cnt as bigint)           as exact_cnt,
           cast(cm_est as bigint)        as cm_est,
           cast(cm_est - cnt as bigint)  as overestimate
    from est
    order by exact_cnt desc, token asc
    """,
)
def heavy_hitters_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream.

    Scale shape: the vocab aggregation is the only corpus-sized pass
    (partial-agg-absorbed explode — the same shuffle vocabulary_report
    pays); the sketch is built FROM the vocab counts (identical counters
    to folding the raw stream, since addition is associative) and is
    d×w rows by construction, so the estimate join broadcasts it. The
    exact side exists to measure the sketch's overestimate in-result —
    the production path at 100 TB keeps only the fixed-size sketch.
    The top-20 relation is read twice (expansion + estimate join): it is
    20 rows, eagerly checkpointed."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)  # read by sketch + top-20 branches
    )

    def expand(df: DataFrame) -> DataFrame:
        rows = []
        for j in range(_CM_D):
            rows.append(
                df.select(
                    "token",
                    "cnt",
                    F.lit(j).alias("j"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"{j}:"), F.col("token"))),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("bigint")
                        % _CM_W
                    ).alias("bucket"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionAll(r)
        return out

    sketch = (
        expand(vocab)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )
    top20 = (
        vocab.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
        .localCheckpoint(eager=True)
    )
    est = (
        expand(top20)
        .join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("token", "cnt")
        .agg(F.min("c").alias("cm_est"))
    )
    return est.select(
        "token",
        F.col("cnt").alias("exact_cnt"),
        F.col("cm_est"),
        (F.col("cm_est") - F.col("cnt")).cast("bigint").alias("overestimate"),
    ).orderBy(F.desc("exact_cnt"), F.asc("token"))


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction per source
# ---------------------------------------------------------------------------
@_register(
    "tfidf_keywords_report",
    "per-source TF-IDF keyword extraction: source-level term counts x "
    "smoothed idf over the source collection, top-5 keywords per source "
    "by rounded score via a per-source row_number window (compiles to "
    "WindowGroupLimit — map-side per-source top-k before the exchange)",
    f"""
    with tf as (
        select source, t as token, count(*) as tf
        from (select source, unnest({_SQL_TOKENS}) as t from documents)
        where t <> ''
        group by 1, 2
    ),
    s as (select count(distinct source) as n_sources from documents),
    idf as (
        select token, count(*) as df,
               ln(cast((select n_sources from s) as double) / count(*))
                   as idf
        from tf group by token
    ),
    scored as (
        select tf.source, tf.token, tf.tf,
               round(tf.tf * idf.idf, 6) as score
        from tf join idf using (token)
    ),
    ranked as (
        select *, row_number() over (
            partition by source order by score desc, token asc
        ) as rn
        from scored
    )
    select source, token, cast(tf as bigint) as tf, score, rn
    from ranked where rn <= 5
    order by source, rn
    """,
)
def tfidf_keywords_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-before-rank discipline: the tf·idf double is rounded to
    6 dp BEFORE the row_number window so both engines rank identical
    values (token asc tie-break). The idf table is vocab-sized and
    joins the tf table on token — AQE picks the strategy; the per-source
    top-5 compiles to WindowGroupLimit, so each map task forwards at
    most 5 rows per source to the exchange."""
    from pyspark.sql.window import Window

    docs = _spread(_t(spark, sf_dir, "documents"))
    tf = (
        docs.select("source", F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    n_sources = docs.agg(
        F.countDistinct("source").cast("double").alias("n_sources")
    )
    idf = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_sources))
        .select("token", F.log(F.col("n_sources") / F.col("df")).alias("idf"))
    )
    scored = tf.join(idf, "token").select(
        "source",
        "token",
        "tf",
        F.round(F.col("tf") * F.col("idf"), 6).alias("score"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "token", "tf", "score", "rn")
        .orderBy("source", "rn")
    )
