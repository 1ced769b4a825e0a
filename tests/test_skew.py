"""Hostile-skew fixtures (round-6 verdict item 2): fire the skew
defenses with engineered data instead of the benign/uniform testdata.

Three adversarial corpora at sf0.1-like size:
  * hot-gram — one 8-gram planted in 50% of 5000 documents (the
    cookie-banner / license-header shape), firing the sampled
    hot-gram probe and the window→groupBy fallback in
    dedup.duplicate_gram_stats / text.remove_duplicate_spans;
  * hot-domain — one domain holding 30% of all documents, driving the
    WindowGroupLimit map-side cap in domain_cap_report;
  * hot-bucket — a near-constant 2000×64 embedding cloud collapsing
    every vector into one LSH bucket, firing the S×S salt grid.

Each defense must (a) demonstrably TRIGGER (probe verdict / plan
shape), (b) keep wall time bounded vs the defenseless path, and
(c) return results IDENTICAL to the unsalted/undefended reference —
including full Spark-vs-DuckDB oracle parity on the hostile parquet,
the same value-hash gate the driver runs on testdata."""

from __future__ import annotations

import random
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.operators import dedup
from dbt_datbricks_demo_spark.operators.text import remove_duplicate_spans

SRC = "/root/testdata/sf0.001"
N_DOCS = 5000
HOT_GRAM = "alpha bravo charlie delta echo foxtrot golf hotel"
VOCAB = [f"w{i}" for i in range(400)]


def _doc_words(rng: random.Random, n: int) -> list[str]:
    return [VOCAB[rng.randrange(len(VOCAB))] for _ in range(n)]


def _make_documents(hot_gram: bool, hot_domain: bool) -> pa.Table:
    rng = random.Random(1234)
    rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(N_DOCS):
        words = _doc_words(rng, 40)
        if hot_gram and i % 2 == 0:
            # plant the shared 8-gram at a doc-dependent position
            p = i % 30
            words = words[:p] + HOT_GRAM.split() + words[p:]
        text = " ".join(words)
        if hot_domain:
            source = "hotdomain" if i % 10 < 3 else f"src{i % 50}"
        else:
            source = f"src{i % 20}"
        rows["doc_id"].append(i)
        rows["text"].append(text)
        rows["lang"].append(["en", "de", "fr", "es", "zh"][i % 5])
        rows["source"].append(source)
        rows["n_chars"].append(len(text))
    return pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "source": pa.array(rows["source"], pa.string()),
            "n_chars": pa.array(rows["n_chars"], pa.int64()),
        }
    )


def _hostile_dir(tmp_path_factory, name: str, documents: pa.Table) -> str:
    """A full sf-style directory: hostile documents + the other tables
    copied from sf0.001, so queries AND the DuckDB oracle run as-is."""
    d = tmp_path_factory.mktemp(name)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    pq.write_table(documents, d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def hot_gram_dir(tmp_path_factory):
    return _hostile_dir(
        tmp_path_factory, "hotgram", _make_documents(True, False)
    )


@pytest.fixture(scope="module")
def uniform_dir(tmp_path_factory):
    return _hostile_dir(
        tmp_path_factory, "uniform", _make_documents(False, False)
    )


@pytest.fixture(scope="module")
def hot_domain_dir(tmp_path_factory):
    return _hostile_dir(
        tmp_path_factory, "hotdomain", _make_documents(False, True)
    )


def _docs(spark, d):
    return spark.read.parquet(f"{d}/documents.parquet")


# ---------------------------------------------------------------------------
# hot gram: probe verdict, plan switch, both-shapes equality, time bound
# ---------------------------------------------------------------------------
def test_probe_fires_on_hostile_and_not_on_uniform(
    spark, hot_gram_dir, uniform_dir
):
    hostile, uniform = _docs(spark, hot_gram_dir), _docs(spark, uniform_dir)
    # the planted gram sits in ~2500 docs; threshold 500 must trip
    assert dedup.hot_gram_probe(hostile, "doc_id", "text", 8, 500) is True
    # a uniform corpus (max doc-freq ~ a handful) must not
    assert dedup.hot_gram_probe(uniform, "doc_id", "text", 8, 500) is False
    # and the default crawl-scale threshold never trips at this size
    assert (
        dedup.hot_gram_probe(
            hostile, "doc_id", "text", 8, dedup.HOT_GRAM_DOC_FREQ
        )
        is False
    )


def test_auto_switch_changes_plan_shape(spark, hot_gram_dir):
    hostile = _docs(spark, hot_gram_dir)
    windowed = dedup.duplicate_gram_stats(
        hostile, n=8, hot_grams=False
    )
    fallback = dedup.duplicate_gram_stats(hostile, n=8, hot_grams=True)
    auto = dedup.duplicate_gram_stats(hostile, n=8, hot_gram_docs=500)
    w_plan = windowed._jdf.queryExecution().executedPlan().toString()
    f_plan = fallback._jdf.queryExecution().executedPlan().toString()
    a_plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "Window" in w_plan
    # the fallback replaces the window with a totals join (the JOIN
    # STRATEGY is AQE's size-based pick — broadcast at test scale,
    # skew-splittable shuffle at corpus scale — so assert the shape,
    # not the strategy)
    assert "Window" not in f_plan and "Join" in f_plan
    # the sampled probe picked the fallback shape on its own
    assert "Window" not in a_plan and "Join" in a_plan


def test_both_total_shapes_identical_on_hostile_corpus(spark, hot_gram_dir):
    hostile = _docs(spark, hot_gram_dir)
    w = {
        r["id"]: (r["n_grams"], r["n_dup_grams"])
        for r in dedup.duplicate_gram_stats(
            hostile, n=8, hot_grams=False
        ).collect()
    }
    g = {
        r["id"]: (r["n_grams"], r["n_dup_grams"])
        for r in dedup.duplicate_gram_stats(
            hostile, n=8, hot_grams=True
        ).collect()
    }
    assert w == g and len(w) == N_DOCS
    # the planted gram really dominates: every even doc carries
    # duplicated-gram mass
    assert all(g[i][1] >= 1 for i in range(0, N_DOCS, 2))


def test_span_removal_shapes_identical_on_hostile_corpus(
    spark, hot_gram_dir
):
    hostile = _docs(spark, hot_gram_dir).filter(F.col("doc_id") < 1000)
    cols = ["doc_id", "clean_text", "n_spans_removed", "tokens_removed"]
    w = {
        r["doc_id"]: tuple(r[c] for c in cols[1:])
        for r in remove_duplicate_spans(hostile, hot_grams=False)
        .select(*cols)
        .collect()
    }
    g = {
        r["doc_id"]: tuple(r[c] for c in cols[1:])
        for r in remove_duplicate_spans(hostile, hot_grams=True)
        .select(*cols)
        .collect()
    }
    assert w == g and len(w) == 1000
    # the planted span was actually cut from every even doc
    assert all(w[i][1] >= 1 for i in range(0, 1000, 2))
    assert all(HOT_GRAM not in w[i][0] for i in range(0, 1000, 2))


def test_hostile_wall_time_bounded_vs_uniform(
    spark, hot_gram_dir, uniform_dir
):
    """The defended hostile run must stay within a small factor of the
    uniform corpus — the hot gram adds rows, not a serial tail. Coarse
    bound (4×): local[32] timing is jittery; the structural guarantees
    are the plan pins above, this is the smoke alarm."""
    hostile, uniform = _docs(spark, hot_gram_dir), _docs(spark, uniform_dir)

    def run(df):
        t0 = time.perf_counter()
        dedup.duplicate_gram_stats(df, n=8, hot_gram_docs=500).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    run(uniform)  # warm codegen for both paths
    run(hostile)
    t_uniform, t_hostile = run(uniform), run(hostile)
    assert t_hostile <= 4 * t_uniform + 1.0, (t_hostile, t_uniform)


# ---------------------------------------------------------------------------
# hot domain: WindowGroupLimit cap + full DuckDB oracle parity on the
# hostile parquet
# ---------------------------------------------------------------------------
def test_domain_cap_on_hostile_domain(spark, hot_domain_dir):
    from dbt_datbricks_demo_spark.queries import QUERIES

    df = QUERIES["domain_cap_report"].build(spark, hot_domain_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the map-side per-domain pre-limit is IN the executed hostile plan
    assert "WindowGroupLimit" in plan
    rows = {r["source"]: r for r in df.collect()}
    hot = rows["hotdomain"]
    assert hot["n_docs"] == N_DOCS * 3 // 10
    assert hot["n_kept"] == 10  # _DOMAIN_CAP
    assert hot["n_dropped"] == hot["n_docs"] - 10


def test_oracle_parity_on_hostile_dirs(spark, hot_gram_dir, hot_domain_dir):
    """The driver's Spark-vs-DuckDB value-hash gate, run on the HOSTILE
    parquet: the defenses must not change a single value."""
    from tests.oracle_harness import check_query, make_duckdb

    for d, names in (
        (hot_gram_dir, ["duplicate_span_report", "span_removal_report"]),
        (hot_domain_dir, ["domain_cap_report", "domain_quality_rollup"]),
    ):
        con = make_duckdb(d)
        for name in names:
            assert check_query(spark, con, name, d) == [], (name, d)


# ---------------------------------------------------------------------------
# hot bucket: near-constant embedding cloud at 2000×64 — grid triggers,
# pair set identical, wall time no worse than the unsalted join
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def constant_cloud(spark):
    rows = [
        (i, [100.0 + ((i * 37 + d * 11) % 13) * 0.001 for d in range(64)])
        for i in range(2000)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint(eager=True)


def test_hot_bucket_grid_triggers_and_matches_plain(spark, constant_cloud):
    from dbt_datbricks_demo_spark.operators import similarity

    kw = dict(planes=8, threshold=0.999999, dims=64)
    plain = similarity.cosine_neardup_pairs(
        constant_cloud, block_salts=1, **kw
    )
    salted = similarity.cosine_neardup_pairs(
        constant_cloud, block_salts=4, hot_bucket_width=256, **kw
    )
    # trigger evidence: the salted plan splits hot buckets into the
    # S×S grid union branch
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan

    def timed(df):
        t0 = time.perf_counter()
        out = {(r["id_a"], r["id_b"]) for r in df.collect()}
        return out, time.perf_counter() - t0

    timed(plain)  # warm
    want, t_plain = timed(plain)
    got, t_salted = timed(salted)
    assert got == want and len(want) > 0
    # the grid spreads the single 2000-wide bucket's 2M candidate
    # evals across 16 cells — it must never be slower than the
    # one-task join (generous jitter allowance)
    assert t_salted <= t_plain * 1.5 + 1.0, (t_salted, t_plain)


def test_semdedup_adaptive_quantizer_hot_cell_still_fires(spark, constant_cloud):
    """The round-7 ADAPTIVE quantizer (cell count ∝ counted corpus)
    must not defuse the hot-cell defense: a near-constant cloud shares
    every hyperplane sign, so no number of sub-split planes can break
    it apart — the whole cloud lands in ONE cell and the sampled S×S
    grid is still the (only) bound. Asserts (a) the adaptive plane
    count is engaged (>0 at n=2000/width=16), (b) the cloud collapses
    to one cell, (c) the grid branch is in the plan, and (d) flags are
    identical to the unsalted reference."""
    from dbt_datbricks_demo_spark.operators import similarity

    cents = [
        [x / 8000.0 for x in row]
        for row in similarity.ivf_fixed_centroids(16, 64)
    ]
    assert similarity.adaptive_planes(2000, 16, target_cell_width=16) > 0

    kw = dict(
        threshold=0.999999, target_cell_width=16, hot_bucket_width=256
    )
    plain = similarity.semdedup(constant_cloud, cents, block_salts=1, **kw)
    salted = similarity.semdedup(constant_cloud, cents, block_salts=4, **kw)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan  # grid branch engaged

    want = {(r["vec_id"], r["cell"], r["kept"]) for r in plain.collect()}
    got = {(r["vec_id"], r["cell"], r["kept"]) for r in salted.collect()}
    assert got == want and len(got) == 2000
    assert len({c for _, c, _ in got}) == 1  # one hot cell despite planes>0
