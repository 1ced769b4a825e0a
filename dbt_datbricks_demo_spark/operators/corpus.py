"""End-to-end training-corpus cleaning pipeline — the composition the
individual operators exist for. One call takes a raw document table to a
training-ready corpus:

    1. exact dedup        — content-hash groupBy, lowest doc_id wins
    2. quality filter     — token count / punctuation ratio gates
    3. language filter    — stopword-heuristic language allowlist
    4. near-dup removal   — MinHash band candidates, exact-Jaccard
                            verification, drop the higher doc_id of each
                            confirmed pair (single-link, non-transitive:
                            chains A~B~C keep A and C — full clustering
                            needs an iterative connected-components pass,
                            out of one-query scope and documented as such).
                            num_hashes/bands default to the tier-0 fixed
                            geometry for ad-hoc corpora; the registered
                            capstone queries pass the adaptive two-axis
                            geometry keyed off the ingest rowcount
                            (dedup.adaptive_minhash_geometry — round 9:
                            with the geometry fixed, candidate pairs grew
                            quadratically, 1.4M at x30, and the Jaccard
                            verification stage dominated the capstones)

Shuffle budget (see SCALE.md): one content-hash exchange (1), narrow
scans (2, 3), the band-pair exchange + AQE-planned Jaccard verification
joins (4) — broadcast at runtime when the candidate set is small,
shuffled when it is not. The corpus bodies shuffle exactly once —
everything else moves digests and ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.operators import dedup, text


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_punct_ratio: float = 0.2,
    allowed_langs: tuple[str, ...] = ("en", "de", "es", "fr"),
    num_hashes: int = 8,
    bands: int = 2,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.9,
    persist_gated: bool = False,
    broadcast_pair_limit: int = dedup.BROADCAST_PAIR_LIMIT,
    corpus_rows: int | None = None,
) -> DataFrame:
    """Return the cleaned corpus (original columns preserved).

    persist_gated materializes the post-gate corpus once (localCheckpoint;
    on a real pipeline: write it to storage) — the near-dup stage reads it
    from 4 plan branches, and without materialization each branch re-runs
    the regex-heavy language/quality gates over the full corpus.

    corpus_rows: caller-known upper bound on |docs| (parquet footer /
    metastore stats). Both loser sets (exact-dup losers, near-dup
    losers) are bounded by it, so a bound under broadcast_pair_limit
    skips their materialize+count guard jobs entirely (4 jobs + ~1.3 s
    warm driver time at sf0.1)."""
    # 1. exact dedup
    deduped = dedup.exact_dedup(docs, [text_col], id_col, row_bound=corpus_rows)

    # 2 + 3. quality and language gates — one narrow pass
    toks = text.tokens(text_col)
    n_tokens = F.size(toks)
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]"))
    quality_ok = (n_tokens >= min_tokens) & (
        (n_punct * 1.0 / F.nullif(F.length(text_col), F.lit(0)))
        <= max_punct_ratio
    )
    # Examined, left alone (round 13): Catalyst pushes this
    # deterministic gate below the caller's parallelizing repartition
    # to the scan, so on the single-row-group testdata file the whole
    # regex gate runs inside the ONE scan task (~0.37 s serial at
    # sf0.1). A nondeterministic rand()-disjunct pushdown barrier was
    # tried and is FOLDED AWAY by Spark 4's interval simplification
    # (rand() < -1 is provably false), and on a real multi-file table
    # the pushdown is the RIGHT behavior (_spread is a no-op there and
    # filtering at the scan is optimal) — so this is a local testdata
    # artifact, not a scale defect.
    gated = deduped.filter(quality_ok).filter(
        text.predict_lang(text_col).isin(*allowed_langs)
    )
    if persist_gated:
        gated = gated.localCheckpoint(eager=False)

    # 4. near-dup removal among the survivors: the corpus-wide pass is
    # the row-level codegen shingle path (explode → md5 per row →
    # partial-agged minhash); interpreted array lambdas only run on the
    # candidate subset (see dedup.shingle_hash_rows docstring)
    rows = dedup.shingle_hash_rows(gated, id_col, text_col, k=shingle_k)
    sigs = dedup.minhash_sigs_from_rows(rows, id_col, num_hashes=num_hashes)
    pairs = dedup.candidate_pairs_from_sigs(
        sigs, id_col, num_hashes=num_hashes, bands=bands
    ).localCheckpoint(eager=True)
    hashed_small = dedup.candidate_hash_arrays(
        gated, pairs, id_col, text_col, k=shingle_k
    )
    confirmed = dedup.jaccard_pairs_from_hashes(
        hashed_small,
        pairs,
        id_col,
        broadcast_pair_limit=broadcast_pair_limit,
        pairs_prepared=True,
    )
    # losers is O(confirmed duplicate pairs) but DISTINCT ids, so it is
    # also bounded by |docs|: a caller-supplied corpus_rows bound under
    # the limit decides the broadcast with no materialize+count jobs
    # (the loser subtree reads the pairs/hash checkpoints, so the
    # broadcast build is small). Without a bound, the original
    # size-guard: materialize + count, broadcast only under the limit.
    losers = (
        confirmed.filter(F.col("jaccard") >= jaccard_threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    if corpus_rows is not None and corpus_rows <= broadcast_pair_limit:
        return gated.join(F.broadcast(losers), on=id_col, how="left_anti")
    losers = losers.localCheckpoint(eager=True)
    if losers.count() <= broadcast_pair_limit:
        losers = F.broadcast(losers)
    return gated.join(losers, on=id_col, how="left_anti")


def prepare_training_set(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_bigram_frac: float = 0.2,
    max_dup_5gram_frac: float = 0.3,
    splits: dict[str, float] | None = None,
    decontam_n: int = 3,
    decontam_threshold: float = 0.05,
    **clean_kwargs,
) -> DataFrame:
    """The full raw-corpus → training-set composition:

        1. clean_corpus       — exact dedup, quality/language gates,
                                MinHash near-dup removal
        2. repetition gate    — drop boilerplate (top-bigram coverage /
                                duplicate-5-gram fraction thresholds)
        3. deterministic split— md5-hash train/val/test assignment
        4. decontamination    — drop train/val documents whose word
                                n-grams overlap the TEST split (the
                                held-out benchmark must not leak into
                                the training mixture)

    Returns the surviving documents with a `split` column. The cleaned
    corpus with repetition stats + split is eagerly materialized ONCE
    (localCheckpoint below) because the repetition gate and the
    decontamination stage read it from several plan branches.

    Shuffle budget on top of clean_corpus's: the benchmark n-gram
    distinct (O(|test split|)) and the contamination hits aggregation
    (O(overlapping grams)) — repetition/split/gates are narrow.
    """
    from dbt_datbricks_demo_spark.operators import decontam

    splits = splits or {"train": 0.90, "val": 0.05, "test": 0.05}
    test_name = list(splits)[-1]

    cleaned = clean_corpus(docs, id_col=id_col, text_col=text_col, **clean_kwargs)
    # EAGER checkpoint BEFORE the repetition-gate filter: everything
    # upstream (dedup → gates → near-dup → repetition stats → split)
    # collapses to one materialized relation here, and — critically —
    # the gate then filters on MATERIALIZED stat columns. Filtering on
    # the computed columns pre-checkpoint lets predicate pushdown
    # substitute the full tokenize+n-gram alias trees into the filter
    # condition (each staged-column reference re-derives the arrays),
    # measured at 20× the single-evaluation cost at sf0.1. The three
    # downstream consumers (benchmark grams, contamination hits, final
    # union) all plan against the checkpoint — at corpus scale this is
    # also exactly where a real pipeline writes its intermediate table.
    stats = (
        text.with_repetition_stats(cleaned, text_col=text_col)
        .withColumn("split", text.split_assignment(id_col, splits))
        .localCheckpoint(eager=True)
    )
    # n_tokens stays on the output (optimization round 13): it is
    # materialized in the checkpoint and equals size(tokens(text)) by
    # construction, so consumers that only need token counts (the
    # training_set_report packing aggregate) read the staged column
    # instead of re-running the tokenizer over every surviving
    # document in the final job (guide §2.2 — don't recompute what a
    # materialization already holds).
    assigned = stats.filter(
        (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("dup_5gram_frac") <= max_dup_5gram_frac)
    ).drop("top_bigram_frac", "top_trigram_frac", "dup_5gram_frac")

    bench_docs = assigned.filter(F.col("split") == test_name)
    bench = decontam.distinct_ngram_set(bench_docs, text_col=text_col, n=decontam_n)
    trainval = assigned.filter(F.col("split") != test_name)
    flagged = (
        decontam.contamination_report(
            trainval,
            bench,
            text_col=text_col,
            id_col=id_col,
            n=decontam_n,
            flag_threshold=decontam_threshold,
        )
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    # flagged ids are bounded by |docs|: the caller-known corpus_rows
    # bound (already used for the loser broadcasts in clean_corpus)
    # decides this broadcast too — without the hint the planner's
    # unknown-size estimate plans a sort-merge anti-join whose
    # trainval-side exchange AQE coalesces to one partition, pushing
    # the final union + packing aggregation of the whole surviving
    # corpus into a single task (same defect as candidate_hash_arrays,
    # measured round 13).
    corpus_rows = clean_kwargs.get("corpus_rows")
    if (
        corpus_rows is not None
        and corpus_rows <= clean_kwargs.get(
            "broadcast_pair_limit", dedup.BROADCAST_PAIR_LIMIT
        )
    ):
        flagged = F.broadcast(flagged)
    return trainval.join(flagged, id_col, "left_anti").unionByName(bench_docs)


def corpus_stats(
    cleaned: DataFrame, lang_col_expr=None, text_col: str = "text"
) -> DataFrame:
    """Training-readiness report: per predicted language, document count,
    total/mean whitespace tokens and total BPE-ish tokens."""
    lang = lang_col_expr if lang_col_expr is not None else text.predict_lang(text_col)
    n_tokens = F.size(text.tokens(text_col))
    return (
        cleaned.select(
            lang.alias("lang"),
            n_tokens.alias("n_tokens"),
            text.bpe_token_count(text_col).alias("n_bpe"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens") * 1.0 / F.count(F.lit(1))).alias("avg_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
        )
    )
