"""Round-4 session-4 additions: contrastive-training data operations.

Two operators a training-data pipeline runs downstream of curation:
hard-negative mining (for each anchor embedding, the most-similar
vectors with a DIFFERENT label — the standard negative-sampling step of
contrastive/retrieval training, e.g. DPR/Contriever) and
temperature-scaled mixture weighting (UNIMAX/mT5-style: per-source
sampling weights proportional to share^alpha, flattening the source
distribution before token-budget allocation).

Determinism contract (module convention): cosines are sequential
per-row folds (engine-identical, shared with the ANN oracles); mixture
shares/weights are micro-rounded per source BEFORE the cross-source
normalization sum, so the only raw doubles are single divisions of
exact operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.operators import similarity
from dbt_datbricks_demo_spark.queries.inventory import _register, _spread, _t
from dbt_datbricks_demo_spark.queries.llm_ops import _SQL_TOKENS

_MICRO = "cast(floor(({x}) * 1000000 + 0.5) as bigint)"


def _micro(col) -> F.Column:
    return F.floor(col * 1000000 + F.lit(0.5)).cast("bigint")


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive training negatives)
# ---------------------------------------------------------------------------
_N_ANCHORS = 5
_NEG_K = 5


@_register(
    "hard_negative_mining",
    f"hard-negative mining: for each of {_N_ANCHORS} anchor embeddings, "
    f"the top-{_NEG_K} most-cosine-similar vectors with a DIFFERENT "
    "label (DPR/Contriever negative sampling). The anchor set is a "
    "bounded broadcast; per-anchor ranking is a WindowGroupLimit "
    "window, so each shuffle partition pre-truncates to k candidates — "
    "never a global sort of |anchors|x|corpus| scores",
    f"""
    with anchors as (
        select vec_id as anchor_id, label as anchor_label,
               list_transform(embedding, x -> cast(x as double)) as av
        from embeddings where vec_id < {_N_ANCHORS}
    ),
    scored as (
        select a.anchor_id, e.vec_id as neg_id, e.label as neg_label,
               round(
                   list_sum(list_transform(range(1, 65),
                       i -> cast(e.embedding[i] as double) * a.av[i]))
                   / (sqrt(list_sum(list_transform(range(1, 65),
                          i -> cast(e.embedding[i] as double)
                               * cast(e.embedding[i] as double))))
                      * sqrt(list_sum(list_transform(range(1, 65),
                          i -> a.av[i] * a.av[i])))), 6) as cosine
        from embeddings e
        join anchors a on e.label <> a.anchor_label
    ),
    ranked as (
        select anchor_id, neg_id, neg_label, cosine,
               row_number() over (
                   partition by anchor_id
                   order by cosine desc, neg_id
               ) as rnk
        from scored
    )
    select anchor_id, cast(rnk as bigint) as rnk, neg_id, neg_label, cosine
    from ranked where rnk <= {_NEG_K}
    order by anchor_id, rnk
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _spread(_t(spark, sf_dir, "embeddings"))
    anchors = F.broadcast(
        emb.filter(F.col("vec_id") < _N_ANCHORS).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "av"
            ),
        )
    )
    cos = similarity.pairwise_dot(F.col("embedding"), F.col("av")) / (
        similarity._norm(F.col("embedding")) * similarity._norm(F.col("av"))
    )
    scored = (
        emb.join(anchors, F.col("label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(cos, 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("neg_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _NEG_K)
        .select(
            "anchor_id",
            F.col("rnk").cast("bigint").alias("rnk"),
            "neg_id",
            "neg_label",
            "cosine",
        )
        .orderBy("anchor_id", "rnk")
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weighting (UNIMAX / mT5-style)
# ---------------------------------------------------------------------------
_MIX_ALPHA = 0.3
_MIX_BUDGET = 1_000_000


@_register(
    "temperature_mixture_report",
    "temperature-scaled mixture weighting: per-source token share "
    f"flattened by share^{_MIX_ALPHA} (mT5/UNIMAX upsampling of "
    "low-resource sources), normalized, and allocated against a "
    f"{_MIX_BUDGET}-token budget — ONE corpus aggregation; the "
    "per-source weight math runs on the tiny source table with shares "
    "micro-rounded before the cross-source normalization sum",
    f"""
    with per_source as (
        select source,
               cast(count(*) as bigint) as n_docs,
               cast(sum(len({_SQL_TOKENS})) as bigint) as total_tokens
        from documents group by source
    ),
    tot as (select cast(sum(total_tokens) as double) as grand from per_source),
    weighted as (
        select source, n_docs, total_tokens,
               {_MICRO.format(x='total_tokens / tot.grand')} as share_micro,
               {_MICRO.format(
                   x=f'power(total_tokens / tot.grand, {_MIX_ALPHA})'
               )} as w_micro
        from per_source, tot
    ),
    norm as (select cast(sum(w_micro) as bigint) as wsum from weighted)
    select source, n_docs, total_tokens,
           cast(share_micro as double) / 1e6 as raw_share,
           cast(w_micro as double) / cast(norm.wsum as double) as temp_weight,
           cast(({_MIX_BUDGET}::bigint * w_micro) // norm.wsum as bigint)
               as alloc_tokens
    from weighted, norm
    order by source
    """,
)
def temperature_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_datbricks_demo_spark.operators import text

    docs = _spread(_t(spark, sf_dir, "documents"))
    per_source = docs.select(
        "source", F.size(text.tokens("text")).alias("n_tokens")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    per_source = per_source.localCheckpoint(eager=True)  # tiny; read 3x
    tot = F.broadcast(
        per_source.agg(F.sum("total_tokens").cast("double").alias("grand"))
    )
    weighted = per_source.crossJoin(tot).select(
        "source",
        "n_docs",
        "total_tokens",
        _micro(F.col("total_tokens") / F.col("grand")).alias("share_micro"),
        _micro(F.pow(F.col("total_tokens") / F.col("grand"), _MIX_ALPHA)).alias(
            "w_micro"
        ),
    )
    norm = F.broadcast(weighted.agg(F.sum("w_micro").cast("bigint").alias("wsum")))
    return (
        weighted.crossJoin(norm)
        .select(
            "source",
            "n_docs",
            "total_tokens",
            (F.col("share_micro").cast("double") / 1e6).alias("raw_share"),
            (F.col("w_micro").cast("double") / F.col("wsum").cast("double")).alias(
                "temp_weight"
            ),
            # integer-exact allocation: `div` keeps the whole computation
            # in bigint (floor of a double quotient can land on the wrong
            # side of an integer boundary the exact `//` oracle sees)
            F.expr(f"({_MIX_BUDGET}L * w_micro) div wsum")
            .cast("bigint")
            .alias("alloc_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# DoReMi-style domain-mixture reweighting
# ---------------------------------------------------------------------------
_DOREMI_SHARDS = 8


def _sql_doremi_per_doc(shard: int | None = None) -> str:
    """The per-document unigram-NLL aggregation — the heavy half of
    the DoReMi oracle (token unnest + per-(doc,term) tf + model join).
    With ``shard`` set, restricted to ``doc_id % _DOREMI_SHARDS =
    shard`` (reading the persisted dm_model/dm_tot stage views) so a
    staged derivation bounds the spill to one shard's working set;
    with shard=None it is the monolithic in-query form over its own
    tok/model CTEs. The tf grouping and aggregate expression are
    byte-identical in both forms, so per-doc float summation order is
    associated the same way."""
    if shard is None:
        src, model, tot = "tok", "model", "tot"
    else:
        # the shard restriction lives in the stage's tok_s CTE (the
        # unnest itself is filtered), not here — this fragment only
        # swaps relation names
        src, model, tot = "tok_s", "dm_model", "dm_tot"
    tf = f"""(select doc_id, source, term, count(*) as tf
           from {src} group by 1, 2, 3)"""
    return f"""
        select doc_id, source,
               cast(sum(tf) as bigint) as n_tok,
               cast(round(round(sum(-tf * ln((cnt + 1) / (n + v)))
                                / sum(tf), 6) * 1e6, 0) as bigint)
                   as nll_micro
        from {tf} tf join {model} using (term), {tot}
        group by doc_id, source
    """


def _sql_doremi_tail(per_doc_relation: str) -> str:
    """dom -> mirror-descent steps -> final select, downstream of the
    per-doc NLL relation. Shared verbatim by the monolithic oracle and
    the staged derivation's final stage so the two cannot diverge."""

    def lbar(b: str) -> str:
        return f"((2 * {b}.num + {b}.den) // (2 * {b}.den))"

    def step(t: int) -> str:
        prev = f"w{t - 1}" if t > 1 else "w0"
        src = f"u{t - 1}" if t > 1 else "d0"
        return f"""
    b{t} as (select cast(sum({prev} * l_micro) as bigint) as num,
                    cast(sum({prev}) as bigint) as den from {src}),
    u{t} as (select {src}.*,
                    cast(floor(cast({prev} as double)
                         * exp(cast(0.1 as double)
                               * (cast(l_micro - {lbar(f'b{t}')} as double)
                                  / 1e6))
                         + 0.5) as bigint) as w{t}
             from {src}, b{t})"""

    return f"""
    dom as (
        select source, count(*) as n_docs,
               cast(sum(nll_micro) as bigint) as sum_micro,
               cast(sum(n_tok) as bigint) as toks
        from {per_doc_relation} group by source
    ),
    dtot as (select cast(sum(toks) as bigint) as all_toks from dom),
    d0 as (
        select source, n_docs,
               (2 * sum_micro + n_docs) // (2 * n_docs) as l_micro,
               (2 * toks * 1000000 + all_toks) // (2 * all_toks) as w0
        from dom, dtot
    ),
    {','.join(step(t) for t in (1, 2, 3))},
    ws as (select cast(sum(w3) as bigint) as wsum from u3)
    select source,
           cast(n_docs as bigint)              as n_docs,
           round(cast(w0 as double) / 1e6, 6)  as token_share,
           cast(l_micro as double) / 1e6       as mean_nll,
           round(cast(w3 as double) / cast(wsum as double), 6)
               as doremi_weight
    from u3, ws
    order by source
    """


def _sql_doremi() -> str:
    return f"""
    with tok as (
        select doc_id, source, unnest({_SQL_TOKENS}) as term from documents
    ),
    model as (select term, count(*) as cnt from tok group by term),
    tot as (select cast(sum(cnt) as double) as n,
                   cast(count(*) as double) as v from model),
    per_doc as (
        {_sql_doremi_per_doc(None)}
    ),
    {_sql_doremi_tail('per_doc')}
    """


def staged_doremi_sql() -> list[tuple[str, str]]:
    """The doremi_mixture_report oracle as BOUNDED DuckDB passes
    (round-12: the monolithic derivation's per-(doc,term) tf hash
    aggregate spilled past 52 GB at x100 — the whole token unnest,
    the tf grouping, and the model join share one query's temp
    budget). Stage graph (each row = one connection, one COPY):

      dm_model      term -> corpus count                (documents)
      dm_tot        (n, v) scalars                      (dm_model)
      dm_perdoc_k   per-doc NLL for doc_id % 8 = k,
                    k = 0..7 — each pass unnests only
                    its shard's tokens, so peak temp is
                    ~1/8 of the monolithic              (documents+model)
      result        union shards -> dom -> 3 mirror-
                    descent steps -> final select       (dm_perdoc_*)

    The per-doc aggregate and the tail SQL are the same fragments the
    monolithic oracle is assembled from (_sql_doremi_per_doc /
    _sql_doremi_tail), and scripts/scaled_oracle.py refuses to install
    a staged result until it has hash-verified the staged pipeline
    against a cached monolithic entry at some scale."""
    stages: list[tuple[str, str]] = []
    stages.append((
        "dm_model",
        f"""
        with tok as (
            select unnest({_SQL_TOKENS}) as term from documents
        )
        select term, count(*) as cnt from tok group by term
        """,
    ))
    stages.append((
        "dm_tot",
        "select cast(sum(cnt) as double) as n, "
        "cast(count(*) as double) as v from dm_model",
    ))
    for k in range(_DOREMI_SHARDS):
        stages.append((
            f"dm_perdoc_{k}",
            f"""
            with tok_s as (
                select doc_id, source, unnest({_SQL_TOKENS}) as term
                from documents where doc_id % {_DOREMI_SHARDS} = {k}
            )
            {_sql_doremi_per_doc(k)}
            """,
        ))
    union = " union all ".join(
        f"select * from dm_perdoc_{k}" for k in range(_DOREMI_SHARDS)
    )
    stages.append((
        "result",
        f"""
        with per_doc as ({union}),
        {_sql_doremi_tail('per_doc')}
        """,
    ))
    return stages


@_register(
    "doremi_mixture_report",
    "DoReMi-style domain-mixture reweighting (Xie et al. 2023): 3 "
    "mirror-descent steps upweight domains whose unigram-LM loss "
    "exceeds the current WEIGHTED mean — the steps are genuinely "
    "sequential (the mean moves with the weights) yet stay entirely "
    "in-plan on the per-domain aggregate, micro-int re-quantized each "
    "step so the unrolled-CTE oracle hash-matches "
    "(operators.selection.doremi_weights)",
    _sql_doremi(),
)
def doremi_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_datbricks_demo_spark.operators import selection, text

    docs = _spread(_t(spark, sf_dir, "documents"))
    per_doc = text.unigram_doc_nll(
        docs, keep_cols=("source",)
    ).withColumn("nll_micro", F.round(F.col("avg_nll") * 1e6, 0).cast("bigint"))
    dom = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nll_micro").cast("bigint").alias("sum_micro"),
        F.sum("n_tok").cast("bigint").alias("toks"),
    )
    dtot = dom.agg(F.sum("toks").cast("bigint").alias("all_toks"))
    d0 = (
        dom.crossJoin(F.broadcast(dtot))
        .select(
            "source",
            "n_docs",
            F.expr("(2 * sum_micro + n_docs) div (2 * n_docs)")
            .cast("bigint")
            .alias("l_micro"),
            F.expr("(2 * toks * 1000000 + all_toks) div (2 * all_toks)")
            .cast("bigint")
            .alias("w0"),
        )
        # every iteration's mean-loss aggregate (and the final select)
        # re-reads this relation: one eager checkpoint of the |domains|-row
        # table stops each step from re-deriving the corpus LM pass
        .localCheckpoint(eager=True)
    )
    u3 = selection.doremi_weights(d0, iters=3, eta=0.1)
    ws = u3.agg(F.sum("w3").cast("bigint").alias("wsum"))
    return (
        u3.crossJoin(F.broadcast(ws))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round(F.col("w0").cast("double") / F.lit(1e6), 6).alias(
                "token_share"
            ),
            (F.col("l_micro").cast("double") / F.lit(1e6)).alias("mean_nll"),
            F.round(
                F.col("w3").cast("double") / F.col("wsum").cast("double"), 6
            ).alias("doremi_weight"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Sequence-length bucketed batching (padding-waste accounting)
# ---------------------------------------------------------------------------
_BATCH_DOCS = 8
_LEN_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def _sql_len_bucket() -> str:
    cases = " ".join(
        f"when nt <= {b} then {b}" for b in _LEN_BUCKETS
    )
    return f"case {cases} else {_LEN_BUCKETS[-1] * 2} end"


@_register(
    "length_bucket_batching_report",
    "sequence-length bucketed batching: documents bin into power-of-2 "
    "length buckets (the standard padding-efficiency trick — batching "
    f"similar lengths together; batch size {_BATCH_DOCS} docs), with "
    "per-bucket batch counts and the padding fraction each bucket pays "
    "(intra-doc pad to the bucket length + last-batch remainder) — all "
    "exact integer arithmetic on one aggregation pass; the CASE ladder "
    "is deterministic where a float log2 would wobble at exact powers",
    f"""
    with s as (
        select doc_id, len({_SQL_TOKENS}) as nt from documents
    ),
    b as (
        select {_sql_len_bucket()} as bucket_len, nt
        from s where nt > 0
    ),
    agg as (
        select bucket_len,
               count(*) as n_docs,
               cast(sum(nt) as bigint) as total_tokens
        from b group by bucket_len
    )
    select bucket_len,
           cast(n_docs as bigint) as n_docs,
           total_tokens,
           (n_docs + {_BATCH_DOCS - 1}) // {_BATCH_DOCS} as n_batches,
           cast(((n_docs + {_BATCH_DOCS - 1}) // {_BATCH_DOCS})
                * {_BATCH_DOCS} * bucket_len - total_tokens as bigint)
               as padded_tokens,
           round(1.0 - cast(total_tokens as double)
                 / cast(((n_docs + {_BATCH_DOCS - 1}) // {_BATCH_DOCS})
                        * {_BATCH_DOCS} * bucket_len as double), 6)
               as pad_frac
    from agg
    order by bucket_len
    """,
)
def length_bucket_batching_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dbt_datbricks_demo_spark.operators import text

    docs = _spread(_t(spark, sf_dir, "documents"))
    nt = F.size(text.tokens("text"))
    bucket = F.lit(_LEN_BUCKETS[-1] * 2)
    for b in reversed(_LEN_BUCKETS):
        bucket = F.when(F.col("nt") <= b, F.lit(b)).otherwise(bucket)
    agg = (
        docs.select(nt.alias("nt"))
        .filter(F.col("nt") > 0)
        .select(bucket.alias("bucket_len"), "nt")
        .groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
        )
    )
    n_batches = F.expr(
        f"(n_docs + {_BATCH_DOCS - 1}) div {_BATCH_DOCS}"
    ).cast("bigint")
    cap = n_batches * F.lit(_BATCH_DOCS) * F.col("bucket_len")
    return (
        agg.select(
            "bucket_len",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "total_tokens",
            n_batches.alias("n_batches"),
            (cap - F.col("total_tokens")).cast("bigint").alias("padded_tokens"),
            F.round(
                F.lit(1.0)
                - F.col("total_tokens").cast("double") / cap.cast("double"),
                6,
            ).alias("pad_frac"),
        )
        .orderBy("bucket_len")
    )
