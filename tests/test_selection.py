"""Laws for the data-selection surface (operators.selection + the
round-6 selection/sketch queries): Bloom filters admit no false
negatives, budget selection is a maximal feasible prefix, DSIR
separates the target domain, count-min never underestimates, and the
leakage-safe split keeps every near-dup component intact."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.operators import selection
from dbt_datbricks_demo_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_bloom_has_no_false_negatives(spark):
    """Every gram that fed the filter must probe positive — the Bloom
    guarantee that makes it safe for decontamination (a false negative
    would leak benchmark text into training data)."""
    grams = spark.createDataFrame(
        [(f"gram number {i}",) for i in range(500)], ["gram"]
    )
    bloom = selection.bloom_build(grams)
    hits = selection.bloom_probe(
        grams.withColumn("gid", F.monotonically_increasing_id()),
        bloom,
        key_cols=("gid",),
    )
    assert hits.filter(~F.col("bloom_hit")).count() == 0
    assert hits.count() == 500


def test_bloom_filter_size_is_bounded_by_construction(spark):
    """The words table can never exceed m/32 rows no matter how many
    grams feed it — the property that licenses the unconditional
    broadcast in bloom_probe."""
    big = spark.range(20_000).select(
        F.concat(F.lit("g"), F.col("id")).alias("gram")
    )
    words = selection.bloom_build(big)
    assert words.count() <= selection.BLOOM_M_BITS // selection._WORD_BITS


def test_budget_selection_is_maximal_feasible_prefix(spark):
    """Selected docs form a prefix of the (score desc, id asc) order,
    their weight total fits the budget, and the FIRST unselected doc
    would overflow it (maximality)."""
    rows = [(i, (i * 37) % 100 * 10_000, 50 + (i * 13) % 60) for i in range(400)]
    scored = spark.createDataFrame(rows, ["doc_id", "score_micro", "nt"])
    budget = scored.agg(F.expr("sum(nt) div 3").alias("budget"))
    out = selection.budget_prefix_selection(
        scored, budget, score_col="score_micro", weight_col="nt"
    ).toPandas()
    b = out["budget"].iloc[0]
    out = out.sort_values(
        ["score_micro", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    sel = out["selected"].tolist()
    # prefix property: no selected row after the first unselected one
    if False in sel:
        first_out = sel.index(False)
        assert not any(sel[first_out:])
        # maximality: the first unselected row would overflow
        assert out["nt"][: first_out + 1].sum() > b
    assert out[out["selected"]]["nt"].sum() <= b


def test_dsir_scores_separate_target_domain(spark):
    """Documents from the target source must average a higher importance
    score than the rest — the discriminative property DSIR exists for."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "source")
    )
    scored = selection.dsir_scores(
        docs, is_target=F.col("source") == F.lit("src0")
    ).join(docs.select("doc_id", "source"), "doc_id")
    means = dict(
        scored.groupBy(F.col("source") == F.lit("src0"))
        .agg(F.avg("dsir_score").alias("m"))
        .collect()
    )
    assert means[True] > means[False]


def test_count_min_never_underestimates(spark):
    """cm_est >= exact_cnt for every reported token — the deterministic
    count-min guarantee (collisions only ADD)."""
    out = QUERIES["heavy_hitters_report"].build(spark, SF).toPandas()
    assert len(out) == 20
    assert (out["overestimate"] >= 0).all()
    assert (out["cm_est"] >= out["exact_cnt"]).all()


def test_leakage_split_keeps_components_whole(spark):
    """The certification column the oracle pins must be literally zero,
    and split fractions must roughly follow 90/5/5."""
    out = QUERIES["leakage_safe_split"].build(spark, SF).toPandas()
    assert (out["cross_split_pairs"] == 0).all()
    n = out.set_index("split")["n_docs"]
    assert n["train"] > 5 * (n["val"] + n["test"])
