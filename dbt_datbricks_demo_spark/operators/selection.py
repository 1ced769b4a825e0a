"""Data-selection operators for training-corpus curation.

Three selection primitives a 100-TB pre-training pipeline runs between
dedup and packing, each re-expressed Spark-first:

- **DSIR importance weighting** (Xie et al., "Data Selection for
  Language Models via Importance Resampling", NeurIPS 2023): score every
  raw document by the log-likelihood ratio of a target-domain hashed
  n-gram model against the raw-corpus model. The model is a FIXED
  number of hash buckets (not a vocabulary), so at any corpus size the
  per-bucket log-ratio table is O(buckets) — a guaranteed broadcast —
  and scoring is one map-side join over the feature explosion.

- **Bloom-filter membership probe** (Bloom 1970; the scalable
  decontamination / URL-seen-set primitive): build an m-bit filter over
  a benchmark n-gram set as a ≤ m/32-row (word_idx, word) table via a
  bitwise-OR aggregation, then probe the corpus with a broadcast join.
  Unlike the digest-set broadcast in operators.decontam — whose size is
  O(|benchmark|) — the filter's size is FIXED by (m, k) no matter how
  many grams feed it, trading a bounded, measurable false-positive rate
  for an O(1) memory probe. Both engines compute identical bits, so
  false positives are deterministic and the DuckDB oracle hash-matches
  them exactly.

- **Token-budget prefix selection**: "fill a token budget with the
  best-scoring documents" — a global sort + prefix-sum, implemented
  with the banded block prefix-sum pattern (intra-band window + tiny
  cumulated band-offset table) so no corpus-sized single-partition
  window ever exists.

Reference scope: the reference repo (an IoT dbt demo) has none of
these; they extend its quality-filter surface (SURVEY §2 F-family) with
the standard selection stage of LLM data pipelines.
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.operators.text import tokens

# ---------------------------------------------------------------------------
# shared hash convention (mirrors operators.dedup.md5_int32): first 8 md5
# hex digits as an unsigned 32-bit integer — cheap, engine-portable
# (DuckDB: ('0x' || substr(md5(x), 1, 8))::ubigint)
# ---------------------------------------------------------------------------


def _h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# DSIR: hashed n-gram importance weights
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024  # fixed model size; the paper uses 10k for full CC


def hashed_bigram_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS, salt: str = "dsir",
) -> DataFrame:
    """(id, bucket, tf) hashed word-bigram counts per document.

    One explode feeding a partial-agg-absorbed groupBy: the shuffle
    carries at most |docs|×min(doc_bigrams, buckets) narrow rows. The
    bigram is built with zip_with over offset slices (JVM codegen, no
    interpreted HOF lambdas in the per-token path)."""
    toks = tokens(text_col)
    n_minus_1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n_minus_1),
        F.slice(toks, 2, n_minus_1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        df.select(F.col(id_col), F.explode(pairs).alias("_g"))
        .select(
            id_col,
            (_h32(F.concat(F.lit(salt + ":"), F.col("_g"))) % buckets).alias(
                "bucket"
            ),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def dsir_scores(
    corpus: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document DSIR importance score: average hashed-bigram
    log-likelihood ratio log p_target(b) / p_raw(b), add-one smoothed
    over (N + buckets).

    Scale shape: ONE feature explosion feeds both the per-doc tf table
    and the two bucket models (conditional aggregation in the same
    groupBy — the target model is a filtered sum over the same rows, not
    a second scan). The per-bucket log-ratio table has exactly
    `buckets` rows — broadcast unconditionally, it is fixed-size by
    construction — and the N totals attach as a one-row broadcast, so
    scoring never shuffles anything doc-sized except the (id, bucket,
    tf) features themselves, once.

    Determinism: log() on identical double inputs, summed per doc and
    rounded to 6 dp at the end (the module convention for float folds —
    see queries.inventory docstring; same discipline as
    text.unigram_doc_nll which holds at all tested SFs).
    """
    feats = corpus.select(
        F.col(id_col), is_target.alias("_tgt"), F.col(text_col)
    )
    tf = hashed_bigram_features(feats, text_col, id_col, buckets)
    # both the model aggregation and the scoring join read the feature
    # table — materialize the explosion once (the capstone single-eager-
    # checkpoint discipline) instead of re-running it per branch
    tf = tf.join(feats.select(id_col, "_tgt"), id_col).localCheckpoint(
        eager=True
    )

    # the bucket model is read twice (log-ratio table + N totals): it is
    # `buckets` rows by construction, so a second eager checkpoint here
    # costs nothing and saves a full re-aggregation of the corpus-sized
    # feature table for the totals branch
    model = tf.groupBy("bucket").agg(
        F.sum("tf").cast("bigint").alias("c_raw"),
        F.sum(F.when(F.col("_tgt"), F.col("tf")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("c_tgt"),
    ).localCheckpoint(eager=True)
    totals = model.agg(
        F.sum("c_raw").cast("double").alias("_n_raw"),
        F.sum("c_tgt").cast("double").alias("_n_tgt"),
    )
    # log ratio per bucket; the (N + B) normalizers cancel into one
    # per-document constant added after the fold
    ratio = model.select(
        "bucket",
        (F.log(F.col("c_tgt") + 1) - F.log(F.col("c_raw") + 1)).alias("_lr"),
    )
    return (
        tf.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_feats"),
            F.sum(F.col("tf") * F.col("_lr")).alias("_fold"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "n_feats",
            F.round(
                F.col("_fold") / F.col("n_feats")
                + F.log(F.col("_n_raw") + F.lit(float(buckets)))
                - F.log(F.col("_n_tgt") + F.lit(float(buckets))),
                6,
            ).alias("dsir_score"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter as a (word_idx, word) table
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 18  # 256 Ki bits = 8192 32-bit words ≈ 64 KiB
BLOOM_K = 3

# 32-bit words (not 64): the set-bit mask 1 << (pos % 32) stays ≤ 2^31,
# inside bigint range on BOTH engines without signed-overflow edge cases
# (DuckDB raises on 1::bigint << 63; Java silently wraps — neither
# behavior is portable, so the word width avoids bit 63 entirely).
_WORD_BITS = 32


def _bloom_positions(gram: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for one gram: h32(j ':' gram) % m."""
    return F.array(
        *[
            _h32(F.concat(F.lit(f"{j}:"), gram)) % m_bits
            for j in range(k)
        ]
    )


def bloom_build(
    grams: DataFrame,
    gram_col: str = "gram",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Aggregate a gram set into an m-bit Bloom filter, represented as a
    sparse (word_idx, word) table of non-zero 32-bit words.

    Distributed build: explode each gram's k positions, map to
    (word_idx, set-bit mask), bitwise-OR aggregate per word. Partial
    aggregation absorbs the explosion map-side, so the shuffle carries
    at most m/32 rows per map partition REGARDLESS of how many grams
    feed the filter — the whole point of the structure at 100 TB (the
    benchmark side can be billions of URLs/grams; the filter stays
    64 KiB)."""
    pos = grams.select(
        F.explode(
            _bloom_positions(F.col(gram_col), m_bits, k)
        ).alias("_pos")
    )
    return (
        pos.select(
            (F.col("_pos") / _WORD_BITS).cast("bigint").alias("word_idx"),
            # shiftleft's amount must be a Column here (pyspark's typed
            # wrapper only takes int literals) — SQL expression form
            F.expr(
                f"shiftleft(cast(1 as bigint), cast(_pos % {_WORD_BITS} as int))"
            ).alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_probe(
    probes: DataFrame,
    bloom_words: DataFrame,
    gram_col: str = "gram",
    key_cols: tuple[str, ...] = ("doc_id",),
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership-test every probe gram against the filter: true iff all
    k bits are set. Returns one row per `key_cols` (which the caller
    makes unique per probe gram — e.g. (doc_id, gram-digest), the
    repo's corpus-string-shuffle convention: the gram STRING is consumed
    map-side computing positions and never reaches an exchange) with a
    `bloom_hit` boolean.

    The filter table is broadcast UNCONDITIONALLY — its size is bounded
    by m/32 rows by construction (not by data), so this is the one
    broadcast in the repo that needs no counted guard. Each probe
    explodes to k (word_idx, bit) rows, hash-probes the broadcast
    filter map-side, and folds back with sum(bit set) == k; partial
    aggregation collapses the k rows before the exchange, so the only
    shuffle carries (key, hits) — nothing gram- or text-sized."""
    kp = [F.col(c) for c in key_cols]
    pos = probes.select(
        *kp,
        F.explode(_bloom_positions(F.col(gram_col), m_bits, k)).alias("_pos"),
    ).select(
        *kp,
        (F.col("_pos") / _WORD_BITS).cast("bigint").alias("word_idx"),
        (F.col("_pos") % _WORD_BITS).cast("int").alias("_bit"),
    )
    return (
        pos.join(F.broadcast(bloom_words), "word_idx", "left")
        .select(
            *kp,
            F.expr(
                "shiftright(coalesce(word, cast(0 as bigint)), _bit) & 1"
            ).alias("_set"),
        )
        .groupBy(*key_cols)
        .agg((F.sum("_set") == F.lit(k)).alias("bloom_hit"))
    )


# ---------------------------------------------------------------------------
# Token-budget prefix selection (banded block prefix sum)
# ---------------------------------------------------------------------------

BUDGET_BANDS_DIV = 10_000  # score_micro in [0, 1e6] → ≤ 101 bands


def budget_prefix_selection(
    scored: DataFrame,
    budget: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score_micro",
    weight_col: str = "n_tokens",
) -> DataFrame:
    """Select the best-scoring prefix of documents whose cumulative
    `weight_col` stays within a budget: rows ordered by (score desc,
    id asc), selected while running total ≤ budget.

    `budget` is a one-row DataFrame with a bigint `budget` column
    (computed in-plan, e.g. a fraction of the corpus total — never a
    driver-side literal of data-dependent value).

    Scale shape — the banded block prefix sum (same pattern as the
    sessionization sweep line): a naive window over (ORDER BY score)
    with no partition key collapses 100 TB into ONE task. Instead:
    integer score bands partition the intra-band running sums
    (per-band windows, parallel), a ≤ 101-row per-band total table is
    cumulated with a tiny single-partition window (aggregated data —
    safe), and the band offset joins back by broadcast. The global
    running total is offset + intra-band running sum, without any
    corpus-sized single-partition stage."""
    banded = scored.withColumn(
        "_band", (F.col(score_col) / BUDGET_BANDS_DIV).cast("bigint")
    )
    intra = Window.partitionBy("_band").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_intra = banded.withColumn(
        "_run_in_band", F.sum(weight_col).over(intra)
    )
    band_totals = banded.groupBy("_band").agg(
        F.sum(weight_col).cast("bigint").alias("_band_total")
    )
    # ≤ 101 aggregated rows: a single-partition window here is O(bands)
    offsets = band_totals.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_band_total").over(
                Window.orderBy(F.col("_band").desc()).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).cast("bigint"),
    ).select("_band", "_offset")
    return (
        with_intra.join(F.broadcast(offsets), "_band")
        .crossJoin(F.broadcast(budget))
        .withColumn(
            "_running", (F.col("_offset") + F.col("_run_in_band")).cast("bigint")
        )
        .withColumn("selected", F.col("_running") <= F.col("budget"))
        .drop("_band", "_run_in_band", "_offset")
    )


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (mirror descent on per-domain excess loss)
# ---------------------------------------------------------------------------
def doremi_weights(
    per_domain: DataFrame,
    iters: int = 3,
    eta: float = 0.1,
    loss_col: str = "l_micro",
    weight_col: str = "w0",
) -> DataFrame:
    """Multiplicative-weights domain reweighting (the Group-DRO update at
    the heart of DoReMi, Xie et al. 2023): starting from baseline
    weights w0 (token shares), each step upweights domains whose loss
    exceeds the current WEIGHTED mean loss:

        w_d ← round( w_d · exp(eta · (L_d − L̄_t) / 1e6) )
        L̄_t = round( Σ w_d L_d / Σ w_d )        (micro-nats, half-up)

    The steps are genuinely sequential — L̄_t moves as the weights move —
    and everything stays IN-PLAN on the aggregated per-domain table
    (|domains| rows): each iteration is one tiny aggregate broadcast
    back as a scalar, never a driver-side loop over collected rows.
    Cross-engine exactness: losses and weights are micro-unit bigints
    re-quantized after every step (order-free sums; the only doubles
    are exp() of identical quotients and one multiply, floor(x+0.5)
    half-up), so a SQL oracle unrolling the same CTEs hash-matches.
    At 100 TB the per-domain table is at most ~1e8 rows (registered
    hosts) and the scalar aggregates stay two-column — the corpus-sized
    work is entirely in the upstream loss pass."""
    cur = per_domain
    w_prev = weight_col
    for t in range(1, iters + 1):
        bar = cur.agg(
            F.sum(F.col(w_prev) * F.col(loss_col)).cast("bigint").alias("_num"),
            F.sum(w_prev).cast("bigint").alias("_den"),
        )
        cur = (
            cur.crossJoin(F.broadcast(bar))
            .withColumn(
                f"_lbar{t}",
                F.expr("(2 * _num + _den) div (2 * _den)").cast("bigint"),
            )
            .withColumn(
                f"w{t}",
                F.floor(
                    F.col(w_prev).cast("double")
                    * F.exp(
                        F.lit(float(eta))
                        * (
                            (F.col(loss_col) - F.col(f"_lbar{t}")).cast("double")
                            / F.lit(1e6)
                        )
                    )
                    + F.lit(0.5)
                ).cast("bigint"),
            )
            .drop("_num", "_den")
        )
        w_prev = f"w{t}"
    return cur
