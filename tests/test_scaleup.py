"""Weak-scaling generator invariants (testing/scaleup.py).

The measured scaling curve in SCALE.md is only evidence if the scaled
data actually has weak-scaling semantics: every structural statistic a
query's cost depends on (duplicates, near-dup components, join fan-out,
group counts) must scale ×k, never ×k² or ×1. These tests pin that, and
— the load-bearing one — run the Spark-vs-DuckDB oracle gate ON the
scaled directory, proving the replicas were generated correctly by an
independent engine."""

from __future__ import annotations

import duckdb
import pytest

from dbt_datbricks_demo_spark.testing.scaleup import (
    WORD_PERIOD,
    scale_up_dir,
)

SRC = "/root/testdata/sf0.001"
FACTOR = 2
DOC_OFF = 10_000_000
VEC_OFF = 1_000_000


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dst = tmp_path_factory.mktemp("scaleup") / f"x{FACTOR}"
    return scale_up_dir(SRC, str(dst), FACTOR)


@pytest.fixture(scope="module")
def con(scaled):
    c = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        c.sql(f"create view {t} as select * from '{scaled}/{t}.parquet'")
        c.sql(f"create view src_{t} as select * from '{SRC}/{t}.parquet'")
    return c


def _one(con, sql):
    return con.execute(sql).fetchone()[0]


def test_row_counts_scale_and_dims_freeze(con):
    for t in (
        "customer supplier part orders lineitem events documents embeddings"
    ).split():
        assert _one(con, f"select count(*) from {t}") == FACTOR * _one(
            con, f"select count(*) from src_{t}"
        ), t
    for t in ("nation", "region"):
        assert _one(con, f"select count(*) from {t}") == _one(
            con, f"select count(*) from src_{t}"
        ), t


def test_schemas_identical_to_source(con):
    for t in ("documents", "embeddings", "events", "lineitem", "orders"):
        assert (
            con.execute(f"describe select * from {t}").fetchall()
            == con.execute(f"describe select * from src_{t}").fetchall()
        ), t


def test_replica_zero_is_the_identity(con):
    assert (
        _one(
            con,
            f"""select count(*) from (
              select * from documents where doc_id < {DOC_OFF}
              except select * from src_documents)""",
        )
        == 0
    )


def test_no_exact_duplicate_text_across_replicas(con):
    # exact-dedup working set must scale ×k: replica 1 shares no text
    # with replica 0 (word 0 always carries the replica tag)
    assert (
        _one(
            con,
            f"""select count(*) from documents a join documents b
            on a.text = b.text
            and a.doc_id < {DOC_OFF} and b.doc_id >= {DOC_OFF}""",
        )
        == 0
    )


def test_no_duplicate_8gram_survives_across_replicas(con):
    # ExactSubstr gram mass must scale ×k: the perturbation period (7)
    # is below the gram order (8), so every 8-word window crosses a
    # perturbed position
    assert WORD_PERIOD < 8
    assert (
        _one(
            con,
            f"""with g as (
              select doc_id, array_to_string(words[i:i+7], ' ') gram
              from (select doc_id, string_split(text, ' ') words
                    from documents),
                   lateral (select unnest(generate_series(
                       1, greatest(len(words) - 7, 0))) i))
            select count(*) from g a join g b on a.gram = b.gram
            and a.doc_id < {DOC_OFF} and b.doc_id >= {DOC_OFF}""",
        )
        == 0
    )


def test_n_chars_invariant_holds_on_perturbed_text(con):
    assert _one(
        con, "select count(*) from documents where n_chars <> length(text)"
    ) == 0


def test_embeddings_jittered_labels_preserved(con):
    # replicas must not be byte-equal (SemDeDup/ANN would see exact
    # dups) but the jitter is bounded ±0.01 and labels stay put
    assert (
        _one(
            con,
            f"""select count(*) from embeddings a join embeddings b
            on a.vec_id + {VEC_OFF} = b.vec_id
            where a.embedding = b.embedding""",
        )
        == 0
    )
    assert (
        _one(
            con,
            f"""select max(list_max(list_transform(
                 list_zip(a.embedding, b.embedding),
                 p -> abs(p[1] - p[2]))))
            from embeddings a join embeddings b
            on a.vec_id + {VEC_OFF} = b.vec_id""",
        )
        <= 0.0101
    )
    assert (
        _one(
            con,
            f"""select count(*) from embeddings a join embeddings b
            on a.vec_id + {VEC_OFF} = b.vec_id
            where a.label <> b.label""",
        )
        == 0
    )


def test_foreign_keys_stay_consistent(con):
    # join fan-out scales ×k only if every FK finds its replica's
    # partner: zero orphans on every scaled join edge
    for sql in (
        "select count(*) from lineitem l anti join orders o "
        "on l.l_orderkey = o.o_orderkey",
        "select count(*) from lineitem l anti join part p "
        "on l.l_partkey = p.p_partkey",
        "select count(*) from lineitem l anti join supplier s "
        "on l.l_suppkey = s.s_suppkey",
        "select count(*) from orders o anti join customer c "
        "on o.o_custkey = c.c_custkey",
    ):
        assert _one(con, sql) == 0, sql


def test_idempotent_via_manifest(scaled, con, monkeypatch):
    # a second call with the same (src, factor, version) must be a no-op
    import dbt_datbricks_demo_spark.testing.scaleup as m

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("regenerated despite matching manifest")

    monkeypatch.setattr(m.duckdb, "connect", boom)
    assert m.scale_up_dir(SRC, scaled, FACTOR) == scaled


def test_adaptive_geometry_keeps_planted_recall_on_scaled_dir(scaled, spark):
    """Round-8 verdict item 1's recall condition, on the SCALEUP
    fixture: the tier-1 (32-hash, 4x8) geometry's in-result planted-
    pair banding recall must be at least the fixed 2x4 baseline's on
    the same data. Deterministic (md5 hashes, fixed fixture)."""
    from dbt_datbricks_demo_spark.operators import dedup

    docs = spark.read.parquet(f"{scaled}/documents.parquet")
    fixed = dedup.planted_recall_cert(docs, 8, 2).collect()[0]
    adaptive = dedup.planted_recall_cert(docs, 32, 4).collect()[0]
    assert fixed["cert_planted"] == adaptive["cert_planted"] == 16
    assert adaptive["cert_band_hits"] >= fixed["cert_band_hits"]
    assert adaptive["cert_band_hits"] >= 15  # J~0.98 >> the 0.841 knee


def test_oracle_gate_passes_on_scaled_dir(scaled, spark):
    """The load-bearing check: the driver-style Spark-vs-DuckDB value
    comparison holds on the scaled directory for a representative
    query slice (dedup, spans, sessions, joins, curation, profiling) —
    the scaled data is real input, not just bigger bytes."""
    from tests.oracle_harness import check_query, make_duckdb

    con = make_duckdb(scaled)
    for name in (
        "exact_dedup_docs",
        "span_removal_report",
        "sessionize_events",
        "product_type_profit",
        "domain_cap_report",
        "table_profile_report",
    ):
        assert check_query(spark, con, name, scaled) == [], name
