"""Round-4 model-based curation additions.

Unigram-LM perplexity scoring (the CCNet-style perplexity-filtering
step of web-corpus curation, expressed as two partial-agg-absorbed
aggregation passes) and SemDeDup-style semantic deduplication (Abbas
et al. 2023: coarse-quantizer clustering + within-cluster cosine
pruning). Both extend the reference's quality-filter surface (SURVEY
§2 F-family) with the operators a training-data pipeline layers on
top; DuckDB oracles compute literally the same values.

Determinism: token/term counts and N+V totals are exact integers; the
only floats are ln() of identical IEEE quotients, folded per document
and rounded to 6 dp (module convention for order-dependent low bits),
and the index-order cosine folds shared with the ANN oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.operators import similarity, text
from dbt_datbricks_demo_spark.queries.inventory import (
    _register,
    _spread,
    _t,
    _t_rowcount,
)
from dbt_datbricks_demo_spark.queries.llm_ops import _sql_dot, _sql_l2

_SQL_TOKENS = "string_split_regex(trim(lower(text)), '\\s+')"


# ---------------------------------------------------------------------------
# Unigram-LM perplexity scoring
# ---------------------------------------------------------------------------
@_register(
    "unigram_perplexity_report",
    "per-(lang, source) negative-log-likelihood stats under an add-one-"
    "smoothed corpus unigram LM (operators.text.unigram_doc_nll) — the "
    "in-engine analog of perplexity filtering: model training is ONE "
    "partial-agg-absorbed pass, scoring joins tf to the model on term "
    "(never a broadcast of an unbounded vocab), totals attach as a "
    "one-row broadcast",
    f"""
    with tok as (
        select doc_id, lang, source, unnest({_SQL_TOKENS}) as term
        from documents
    ),
    model as (
        select term, count(*) as cnt from tok group by term
    ),
    tot as (
        select cast(sum(cnt) as double) as n, cast(count(*) as double) as v
        from model
    ),
    tf as (
        select doc_id, lang, source, term, count(*) as tf
        from tok group by doc_id, lang, source, term
    ),
    per_doc as (
        select doc_id, lang, source,
               cast(sum(tf) as bigint) as n_tok,
               cast(round(round(sum(-tf * ln((cnt + 1) / (n + v)))
                                / sum(tf), 6) * 1e6, 0) as bigint)
                   as nll_micro
        from tf join model using (term), tot
        group by doc_id, lang, source
    )
    select lang, source,
           cast(count(*) as bigint)   as n_docs,
           cast(sum(n_tok) as bigint) as n_tokens,
           cast(sum(nll_micro) as double) / count(*) / 1e6 as mean_nll,
           cast(min(nll_micro) as double) / 1e6            as min_nll,
           cast(max(nll_micro) as double) / 1e6            as max_nll
    from per_doc
    group by lang, source
    order by lang, source
    """,
)
def unigram_perplexity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    per_doc = text.unigram_doc_nll(
        docs, text_col="text", id_col="doc_id", keep_cols=("lang", "source")
    )
    # group stats over EXACT micro-nat integers: per-doc avg_nll is a
    # 6-dp-rounded double, i.e. within 1 ulp of an integer number of
    # micro-nats — re-rounding a group MEAN of such values lands exactly
    # on .5e-6 boundaries where engine round modes diverge (observed),
    # while the integer sum is order-free and the final divisions are
    # IEEE-identical
    micro = (
        per_doc.withColumn(
            "nll_micro",
            F.round(F.col("avg_nll") * 1e6, 0).cast("bigint"),
        )
    )
    return (
        micro.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            (
                F.sum("nll_micro").cast("double") / F.count(F.lit(1)) / F.lit(1e6)
            ).alias("mean_nll"),
            (F.min("nll_micro").cast("double") / F.lit(1e6)).alias("min_nll"),
            (F.max("nll_micro").cast("double") / F.lit(1e6)).alias("max_nll"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# SemDeDup: coarse-cluster + within-cluster cosine pruning
# ---------------------------------------------------------------------------
# The md5-derived fixed quantizer (same grid as ann_ivf_fixed_topk)
# keeps assignment engine-portable so the whole pipeline — clustering,
# pairwise pruning, keeper selection — is value-hash-verified. The
# testdata embeddings are random, so the demo threshold 0.2 keeps the
# pruning observable; production semantic dedup would use ~0.95 with
# trained centroids (similarity.train_ivf_centroids).
_SEM_CELLS = 16
_SEM_DIMS = 64
_SEM_THRESHOLD = 0.2
# adaptive sub-split (round 7): SemDeDup's own setting is k ∝ N with
# cell width held constant — the fixed 16-cell quantizer measured 4.1×
# time at 10× data (quadratic within-cell work). Cell count now scales:
# p = smallest plane count with 16·32·2^p >= count(*), cell =
# coarse·2^p + p-bit md5-hyperplane sub-bucket (independent "sp" plane
# family). Both engines derive p from their own exact count via integer
# threshold comparisons — no float log2 whose ulp could flip a ceil.
# Width 16 (not the operator's default 32) so the adaptive path is
# EXERCISED at the driver-graded scale: the testdata embeddings tables
# hold 500/500/2000 vectors at sf0.001/0.01/0.1 → planes=1/1/3 — a
# width of 32 would leave planes=0 below 512 vectors and grade only
# the fixed-k fallback.
_SEM_WIDTH = 16
_SEM_MAX_PLANES = 20
_SEM_PLANES_W = similarity.hyperplane_weights(
    _SEM_MAX_PLANES, _SEM_DIMS, prefix="sp"
)
# The raw md5 grid spans ±1000 per component while the corpus embeddings
# are unit-norm (±0.125-ish per component) — unscaled, the ||c||² term
# dominates the argmin and every vector lands in one cell. Dividing by
# 8000 puts centroid components on the embedding scale, giving balanced
# direction-driven cells (measured 17–62 of 500 at sf0.001).
_SEM_FIXED = [
    [x / 8000.0 for x in row]
    for row in similarity.ivf_fixed_centroids(_SEM_CELLS, _SEM_DIMS)
]


def _sql_sem_planes() -> str:
    """The adaptive_planes integer threshold chain over count(*): the
    smallest p with _SEM_CELLS·_SEM_WIDTH·2^p >= n (16·16 here — this
    query deliberately uses a narrower width than the operator's
    default 32), capped — byte-for-byte the loop in
    operators.similarity.adaptive_planes."""
    branches = " ".join(
        f"when n <= {(_SEM_CELLS * _SEM_WIDTH) << p} then {p}"
        for p in range(_SEM_MAX_PLANES)
    )
    return f"(case {branches} else {_SEM_MAX_PLANES} end)"


def _sql_semdedup() -> str:
    """Oracle for the adaptive-quantizer SemDeDup. Two DuckDB-cost
    lessons are baked into the shape (measured on the 6000-row x3
    replica): literal weight lists INSIDE a list_transform lambda are
    rebuilt per ELEMENT (2.5 s/dot-column there) — hoisting them into a
    one-row CTE cross join is 124× faster and bit-identical, because
    the fold itself (per-index sequential double adds) is unchanged;
    and the assignment CTE is consumed by three relations (both
    self-join sides + the final report join), so it is MATERIALIZED to
    compute the per-row argmin/sign work once."""
    wcols = []
    sc_terms = []
    for i, c in enumerate(_SEM_FIXED):
        c2 = 0.0
        for x in c:
            c2 = c2 + x * x
        wcols.append("[" + ", ".join(f"{x!r}::double" for x in c) + f"] as c{i}")
        sc_terms.append(
            f"(-2.0 * list_sum(list_transform(range(1, {_SEM_DIMS + 1}), "
            f"i -> cast(embedding[i] as double) * c{i}[i])) + {c2!r})"
        )
    bits = []
    for p, row in enumerate(_SEM_PLANES_W):
        wcols.append(
            "[" + ", ".join(f"{float(x)!r}::double" for x in row) + f"] as p{p}"
        )
        # plane count masked by the dynamic `planes` column: terms for
        # p >= planes contribute 0, exactly the bits hyperplane_bucket
        # builds Spark-side for literal planes
        bits.append(
            f"(case when {p} < planes and "
            f"list_sum(list_transform(range(1, {_SEM_DIMS + 1}), "
            f"i -> cast(embedding[i] as double) * p{p}[i])) >= 0 "
            f"then {1 << p}::bigint else 0::bigint end)"
        )
    sc = "[" + ",\n               ".join(sc_terms) + "]"
    bucket = "(" + "\n                + ".join(bits) + ")"
    return f"""
    with pl as (
        select {_sql_sem_planes()} as planes
        from (select count(*) as n from embeddings)
    ),
    w as (select {', '.join(wcols)}),
    assigned as materialized (
        select vec_id, embedding,
               cast(list_position(sc, list_min(sc)) - 1 as bigint)
                   * (1::bigint << planes)
               + bucket as cell,
               l2
        from (
            select vec_id, embedding, planes,
                   {sc} as sc,
                   {bucket} as bucket,
                   {_sql_l2("embedding")} as l2
            from embeddings, pl, w
        )
    ),
    dropped as (
        select distinct b.vec_id
        from assigned a join assigned b
          on a.cell = b.cell and a.vec_id < b.vec_id
        where {_sql_dot("a.embedding",
                        "list_transform(b.embedding, x -> cast(x as double))")}
                  / (a.l2 * b.l2) >= {_SEM_THRESHOLD}
    )
    select cell,
           cast(count(*) as bigint) as n_vecs,
           cast(count(*) filter (where d.vec_id is not null) as bigint)
               as n_dropped,
           cast(count(*) filter (where d.vec_id is null) as bigint)
               as n_kept
    from assigned left join dropped d using (vec_id)
    group by cell
    order by cell
    """


# ---------------------------------------------------------------------------
# Semantic (embedding-level) benchmark decontamination
# ---------------------------------------------------------------------------
# Complements decontam_report's n-gram overlap with the embedding-space
# variant: a training vector is contaminated when its cosine to ANY
# benchmark vector exceeds a threshold. The benchmark side is bounded
# by contract (eval sets are small), so it broadcasts and the scan is
# one pass over the corpus — |corpus| x |benchmark| comparisons, never
# a corpus self-join. Threshold 0.25 is demo-scaled to the random
# testdata embeddings (real corpora use ~0.9 with real encoders).
_DECON_THRESHOLD = 0.25


@_register(
    "semantic_decontam_report",
    "embedding-space benchmark decontamination: corpus (label<>0) vs "
    "benchmark (label=0) max-cosine via a bounded broadcast cross join "
    "— per-vector max similarity, deterministic argmax benchmark id "
    "(max-struct trick), close-benchmark count, contamination flag",
    f"""
    with bench as (
        select vec_id as bench_id, embedding as bv,
               {_sql_l2("embedding")} as bl2
        from embeddings where label = 0
    ),
    corpus as (
        select vec_id, embedding, {_sql_l2("embedding")} as l2
        from embeddings where label <> 0
    ),
    pairs as (
        select c.vec_id, b.bench_id,
               {_sql_dot("c.embedding",
                         "list_transform(b.bv, x -> cast(x as double))")}
                   / (c.l2 * b.bl2) as cos
        from corpus c cross join bench b
    )
    select vec_id,
           max(cos)                                   as max_sim,
           (max(struct_pack(c := cos, k := bench_id))).k
                                                      as closest_bench,
           cast(count(*) filter (where cos >= 0.2) as bigint)
                                                      as n_bench_close,
           max(cos) >= {_DECON_THRESHOLD}             as contaminated
    from pairs
    group by vec_id
    """,
)
def semantic_decontam_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _spread(_t(spark, sf_dir, "embeddings"))
    bench = F.broadcast(
        emb.filter(F.col("label") == 0).select(
            F.col("vec_id").alias("bench_id"),
            F.col("embedding").alias("bv"),
            similarity._norm(F.col("embedding")).alias("bl2"),
        )
    )
    corpus = emb.filter(F.col("label") != 0).select(
        "vec_id", "embedding", similarity._norm(F.col("embedding")).alias("l2")
    )
    cos = similarity.pairwise_dot(F.col("embedding"), F.col("bv")) / (
        F.col("l2") * F.col("bl2")
    )
    return (
        corpus.crossJoin(bench)
        .select("vec_id", "bench_id", cos.alias("cos"))
        .groupBy("vec_id")
        .agg(
            F.max("cos").alias("max_sim"),
            F.max(F.struct(F.col("cos"), F.col("bench_id")))
            .getField("bench_id")
            .alias("closest_bench"),
            F.count_if(F.col("cos") >= 0.2).cast("bigint").alias("n_bench_close"),
            (F.max("cos") >= F.lit(_DECON_THRESHOLD)).alias("contaminated"),
        )
    )


@_register(
    "semdedup_report",
    "SemDeDup semantic dedup (operators.similarity.semdedup): ADAPTIVE "
    "quantizer — cell count ∝ corpus (coarse md5 grid × counted-N "
    "hyperplane sub-split, expected cell width held ~32 at any scale, "
    "the paper's k ∝ N setting) so within-cell pairwise work is linear, "
    "not quadratic (the round-6 fixed-k curve measured 4.1× at 10×); "
    "assignment in one narrow pass, within-cell cosine pairs (per-cell "
    "self-join with the sampled hot-cell grid defense), min-id keeper "
    "policy — per-cell kept/dropped counts, the whole "
    "cluster-prune-keep pipeline value-hash-verified (the oracle "
    "re-derives the plane count from its own count(*))",
    _sql_semdedup(),
)
def semdedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _spread(_t(spark, sf_dir, "embeddings"))
    flags = similarity.semdedup(
        emb,
        _SEM_FIXED,
        threshold=_SEM_THRESHOLD,
        id_col="vec_id",
        vec_col="embedding",
        target_cell_width=_SEM_WIDTH,
        max_planes=_SEM_MAX_PLANES,
        # exact count from parquet footers (metastore-stats stand-in) —
        # sizing the quantizer costs no Spark job
        corpus_count=_t_rowcount(sf_dir, "embeddings"),
    )
    return (
        flags.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.count_if(~F.col("kept")).cast("bigint").alias("n_dropped"),
            F.count_if(F.col("kept")).cast("bigint").alias("n_kept"),
        )
        .orderBy("cell")
    )
