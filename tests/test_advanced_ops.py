"""Behavioral unit tests for the round-4 graph / clustering /
incremental-curation operators. The oracle gate (test_oracle_gate)
already value-checks every registered query against DuckDB; these
tests pin the operator-level semantics on hand-built inputs where the
expected answer is known by construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.operators import clustering, dedup, graph


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a bigint, id_b bigint")


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------
def test_pagerank_symmetric_graph_equal_ranks(spark):
    # triangle: perfectly symmetric, every node must end with the same rank
    out = graph.pagerank_fixed(
        _pairs(spark, [(1, 2), (2, 3), (1, 3)]), iterations=3
    ).collect()
    assert len(out) == 3
    assert len({r.rank_ppb for r in out}) == 1
    assert all(r.deg == 2 for r in out)


def test_pagerank_star_hub_outranks_leaves(spark):
    out = {
        r.node: r
        for r in graph.pagerank_fixed(
            _pairs(spark, [(1, 2), (1, 3), (1, 4), (1, 5)]), iterations=3
        ).collect()
    }
    hub, leaves = out[1], [out[i] for i in (2, 3, 4, 5)]
    assert hub.deg == 4
    assert all(hub.rank_ppb > leaf.rank_ppb for leaf in leaves)
    assert len({leaf.rank_ppb for leaf in leaves}) == 1  # symmetry


def test_pagerank_mass_conserved_up_to_truncation(spark):
    # integer division truncates < 1 unit per edge per round; with
    # SCALE=1e9 the total mass stays within edges*iters units of SCALE
    pairs = [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)]
    out = graph.pagerank_fixed(_pairs(spark, pairs), iterations=3).collect()
    total = sum(r.rank_ppb for r in out)
    slack = 2 * len(pairs) * 3 + 100 * 4  # directed-edge + base truncation
    assert graph.SCALE - slack <= total <= graph.SCALE


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------
def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )


def test_kmeans_separates_two_blobs(spark):
    # seeds are ids 0 and 1; blob A hugs (0,0), blob B hugs (10,10)
    rows = [
        (0, (0.0, 0.1)), (1, (10.0, 9.9)),
        (2, (0.2, -0.1)), (3, (0.1, 0.0)),
        (4, (9.8, 10.1)), (5, (10.2, 10.0)),
    ]
    out = clustering.kmeans_fixed(_emb(spark, rows), k=2, iterations=2).collect()
    by_id = {r.id: r.cid for r in out}
    assert by_id[0] == by_id[2] == by_id[3] == 0
    assert by_id[1] == by_id[4] == by_id[5] == 1


def test_kmeans_tie_breaks_to_lower_cid(spark):
    # a point equidistant from both centroids must go to cid 0
    rows = [(0, (0.0, 0.0)), (1, (2.0, 0.0)), (2, (1.0, 0.0))]
    out = clustering.kmeans_fixed(_emb(spark, rows), k=2, iterations=1).collect()
    assert {r.id: r.cid for r in out}[2] == 0


def test_kmeans_quantizes_half_up(spark):
    q = clustering.quantize(F.col("v"))
    row = (
        spark.range(1)
        .select(F.array(F.lit(0.0000005), F.lit(-0.0000005)).alias("v"))
        .select(q.alias("q"))
        .first()
    )
    # floor(x*1e6 + 0.5): +0.5 µ rounds up to 1, −0.5 µ rounds up to 0
    assert row.q == [1, 0]


# ---------------------------------------------------------------------------
# duplicate_gram_stats (ExactSubstr)
# ---------------------------------------------------------------------------
def test_duplicate_gram_stats_planted_duplicate_span(spark):
    span = "a b c d e f g h"  # one exact 8-gram shared between docs 1, 2
    docs = spark.createDataFrame(
        [
            (1, span + " x1 y1 z1"),
            (2, span + " x2 y2 z2"),
            (3, "p q r s t u v w unique tail here"),
            (4, "too short"),  # < 8 tokens: dropped from measurement
        ],
        "doc_id bigint, text string",
    )
    out = {r.id: r for r in dedup.duplicate_gram_stats(docs, n=8).collect()}
    # 11 tokens -> 4 gram positions; only the leading span gram repeats
    assert out[1].n_grams == 4 and out[1].n_dup_grams == 1
    assert out[2].n_grams == 4 and out[2].n_dup_grams == 1
    assert out[3].n_dup_grams == 0
    assert 4 not in out


def test_duplicate_gram_stats_counts_within_doc_repeats(spark):
    # the same 8-gram twice INSIDE one doc is duplicated mass too
    text = "a b c d e f g h " + "a b c d e f g h"
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    row = dedup.duplicate_gram_stats(docs, n=8).first()
    assert row.n_grams == 9
    assert row.n_dup_grams >= 2  # both copies of the repeated gram flagged


# ---------------------------------------------------------------------------
# training_ops semantic laws (parity is oracle-gated; these pin meaning)
# ---------------------------------------------------------------------------
def test_temperature_mixture_invariants(spark):
    from dbt_datbricks_demo_spark.queries.training_ops import (
        _MIX_BUDGET,
        temperature_mixture_report,
    )

    rows = temperature_mixture_report(spark, "/root/testdata/sf0.001").collect()
    assert rows
    # weights form a distribution and allocations respect the budget
    assert abs(sum(r.temp_weight for r in rows) - 1.0) < 1e-9
    assert sum(r.alloc_tokens for r in rows) <= _MIX_BUDGET
    # temperature flattening: the weight share of the largest source
    # shrinks vs its raw share; the smallest source's grows
    hi = max(rows, key=lambda r: r.raw_share)
    lo = min(rows, key=lambda r: r.raw_share)
    assert hi.temp_weight < hi.raw_share + 1e-12
    assert lo.temp_weight > lo.raw_share - 1e-12


def test_hard_negatives_never_share_anchor_label(spark):
    from dbt_datbricks_demo_spark.queries.training_ops import hard_negative_mining
    from dbt_datbricks_demo_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = hard_negative_mining(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        assert labels[r.anchor_id] != r.neg_label
        assert labels[r.neg_id] == r.neg_label


# ---------------------------------------------------------------------------
# video_scene_report parity invariant (ADVICE r4): Spark frames the
# payload in UTF-8 BYTES, DuckDB substr slices CHARACTERS (no blob
# substr exists) — the oracle is valid only while the documents text is
# pure ASCII. Pin that invariant so a future multibyte testdata refresh
# fails HERE, loudly, instead of silently passing a wrong oracle.
# ---------------------------------------------------------------------------
def test_video_scene_oracle_ascii_invariant():
    import duckdb

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        n = duckdb.sql(
            f"select count(*) from '{sf}/documents.parquet' "
            "where octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n == 0, (
            f"{sf}: {n} multibyte docs — the video_scene_report SQL oracle "
            "(character substr) no longer matches the byte-frame operator; "
            "see the PARITY INVARIANT note in queries/analysis_ops.py"
        )


# ---------------------------------------------------------------------------
# remove_duplicate_spans (ExactSubstr removal — the operational rewrite)
# ---------------------------------------------------------------------------
def test_remove_duplicate_spans_cuts_planted_spans(spark):
    from dbt_datbricks_demo_spark.operators.text import remove_duplicate_spans

    shared1 = "a b c d e f g h"          # 8-gram planted in docs 0, 1, 3
    shared2 = "m n o p q r s t"          # 8-gram planted in docs 3, 4
    docs = spark.createDataFrame(
        [
            (0, f"{shared1} x0 y0 z0"),
            (1, f"p q {shared1} r"),
            (2, "too short for any gram"),
            (3, f"{shared1} gap1 gap2 {shared2}"),
            (4, f"{shared2} e4 x4 y4 z4 w4"),
            (5, "i1 i2 i3 i4 i5 i6 i7 i8 i1 i2 i3 i4 i5 i6 i7 i8"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(docs, n=8).collect()}

    # leading span cut, unique tail kept
    assert out[0].clean_text == "x0 y0 z0"
    assert out[0].n_spans_removed == 1
    assert (out[0].tokens_removed, out[0].tokens_kept) == (8, 3)
    # mid-document span cut, both flanks kept
    assert out[1].clean_text == "p q r"
    assert out[1].n_spans_removed == 1
    # short doc passes through unchanged with zero counters
    assert out[2].clean_text == "too short for any gram"
    assert out[2].n_spans_removed == 0 and out[2].tokens_removed == 0
    assert out[2].chars_removed == 0
    # two separated duplicated spans -> 2 spans, only the gap survives
    assert out[3].clean_text == "gap1 gap2"
    assert out[3].n_spans_removed == 2
    assert out[3].tokens_removed == 16
    # within-doc repetition alone triggers removal (the paper dedups
    # self-repeats too); contiguous coverage merges to ONE span
    assert out[5].clean_text == ""
    assert out[5].n_spans_removed == 1
    assert out[5].tokens_removed == 16 and out[5].chars_kept == 0
    # char accounting is consistent with the normalized reassembly
    for r in out.values():
        assert r.chars_kept == len(r.clean_text)
        assert r.tokens_total == r.tokens_kept + r.tokens_removed
