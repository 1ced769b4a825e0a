"""The staged oracle derivation harness (round-10 verdict item 1):
every registered staged plan must produce EXACTLY the monolithic
oracle's result, and the harness must refuse to install a staged-only
result until a staged-vs-monolithic verification is on record.

These run pure DuckDB at sf0.001 (500 docs) — no Spark session — so
the per-round suite re-proves the equivalence the big-scale installs
lean on, not just the one-time markers under scaledata/."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def scaled_oracle(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "scaled_oracle_under_test",
        os.path.join(REPO, "scripts", "scaled_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setattr(mod, "RESULTS", str(tmp_path / "ledger.json"))
    return mod


@pytest.mark.parametrize(
    "name",
    ["training_set_report", "minhash_production_lsh", "doremi_mixture_report"],
)
def test_staged_plan_matches_monolithic_and_guards_install(
    scaled_oracle, name
):
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    from dbt_datbricks_demo_spark.queries import QUERIES

    sql = QUERIES[name].oracle
    stages = scaled_oracle._staged_plans()[name]()

    # 1. with NO monolithic entry and NO verification marker, the
    # harness refuses a staged-only install
    with pytest.raises(SystemExit, match="refusing to install"):
        scaled_oracle.derive_oracle_staged(name, SF_DIR, sql, stages)

    # 2. derive the monolithic entry, then the staged pipeline must
    # hash-verify against it (raises SystemExit on divergence)
    pq_mono, _ = scaled_oracle.derive_oracle(name, SF_DIR, sql)
    pq, meta = scaled_oracle.derive_oracle_staged(name, SF_DIR, sql, stages)
    assert meta.get("staged_verified") is True
    marker = os.path.join(
        scaled_oracle.CACHE_DIR, f"staged_verified_{name}.json"
    )
    with open(marker) as fh:
        entries = json.load(fh)
    assert [e["sf_dir"] for e in entries] == ["sf0.001"]

    # 3. belt and braces: compare the staged FINAL stage parquet to the
    # monolithic result with the driver-gate compare directly
    stage_dir = os.path.join(scaled_oracle.CACHE_DIR, "stages")
    finals = [
        f for f in os.listdir(stage_dir)
        if f.startswith(f"{name}_result_") and f.endswith(".parquet")
    ]
    assert len(finals) == 1
    from oracle_harness import compare

    sdf = pd.read_parquet(os.path.join(stage_dir, finals[0]))
    odf = pd.read_parquet(pq_mono)
    assert not compare(name, sdf, odf)


def test_ann_lifecycle_probe_staged_plan_exact_at_small_scale(
    tmp_path, monkeypatch
):
    """The prodvec2m ANN lifecycle gate (scripts/ann_lifecycle.py,
    round-11 verdict item 3) has no monolithic oracle SQL — its staged
    plan (mining_ops.staged_ann_lifecycle_sql) is the only derivation,
    so the per-round suite must re-prove the plan with the EXACT
    driver compare at a small corpus: full IVF-PQ lifecycle (gen A,
    gen B append, tombstone, compact) with adaptive planes, probe +16
    planted twins (each twin's rank-1 must be its source), staged
    DuckDB from-scratch derivation, exact hash-equal. This is the
    validation the checksum-gated prodvec2m run leans on."""
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "scaled_oracle", os.path.join(REPO, "scripts", "scaled_oracle.py")
    )
    so = ilu.module_from_spec(spec)
    saved = sys.modules.get("scaled_oracle")
    sys.modules["scaled_oracle"] = so
    spec.loader.exec_module(so)
    so.CACHE_DIR = str(tmp_path / "cache")
    so.RESULTS = str(tmp_path / "ledger.json")

    spec2 = ilu.spec_from_file_location(
        "ann_lifecycle_under_test",
        os.path.join(REPO, "scripts", "ann_lifecycle.py"),
    )
    lc = ilu.module_from_spec(spec2)
    sys.modules[spec2.name] = lc
    spec2.loader.exec_module(lc)
    try:
        rc = lc.main(
            [
                "--corpus", SF_DIR,
                "--index", str(tmp_path / "ann_lc_index"),
                "--probe-mod", "10",
                "--exact", "--no-record", "--keep-session",
            ]
        )
    finally:
        if saved is not None:
            sys.modules["scaled_oracle"] = saved
        else:
            sys.modules.pop("scaled_oracle", None)
    assert rc == 0


def test_lifecycle_probe_staged_plan_exact_at_small_scale(
    tmp_path, monkeypatch
):
    """The prod2m lifecycle gate (scripts/tier2_lifecycle.py) has no
    monolithic oracle SQL — its staged plan is the only derivation, so
    the per-round suite must re-prove the plan with the EXACT driver
    compare at a small corpus: full lifecycle (gen A, gen B append,
    tombstone, compact) at the production 96x8 geometry, probe +16
    planted twins, staged DuckDB from-scratch derivation, exact
    hash-equal. This is the validation the checksum-gated prod2m run
    leans on."""
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    import importlib.util as ilu

    # isolate the shared scaled_oracle cache/ledger from the repo's
    spec = ilu.spec_from_file_location(
        "scaled_oracle", os.path.join(REPO, "scripts", "scaled_oracle.py")
    )
    so = ilu.module_from_spec(spec)
    saved = sys.modules.get("scaled_oracle")
    sys.modules["scaled_oracle"] = so
    spec.loader.exec_module(so)
    so.CACHE_DIR = str(tmp_path / "cache")
    so.RESULTS = str(tmp_path / "ledger.json")

    spec2 = ilu.spec_from_file_location(
        "tier2_lifecycle_under_test",
        os.path.join(REPO, "scripts", "tier2_lifecycle.py"),
    )
    lc = ilu.module_from_spec(spec2)
    sys.modules[spec2.name] = lc
    spec2.loader.exec_module(lc)
    try:
        rc = lc.main(
            [
                "--corpus", SF_DIR,
                "--index", str(tmp_path / "lc_index"),
                "--exact", "--no-record", "--keep-session",
            ]
        )
    finally:
        if saved is not None:
            sys.modules["scaled_oracle"] = saved
        else:
            sys.modules.pop("scaled_oracle", None)
    assert rc == 0


def test_oracle_derive_watchdog_interrupts_and_cleans_up(
    tmp_path, monkeypatch
):
    """Round 12: ORACLE_DERIVE_TIMEOUT interrupts a pathological DuckDB
    derivation (a quadratic fuzzy-match ate 12+ minutes of a sweep
    budget) so multi-query runs record the error and continue. Pins:
    the interrupt raises within the window, no partial .tmp parquet
    survives, no cache entry is installed, and with the timeout unset
    the same derivation path still works."""
    import importlib.util as ilu
    import time

    spec = ilu.spec_from_file_location(
        "scaled_oracle_watchdog", os.path.join(REPO, "scripts", "scaled_oracle.py")
    )
    so = ilu.module_from_spec(spec)
    sys.modules[spec.name] = so
    spec.loader.exec_module(so)
    so.CACHE_DIR = str(tmp_path / "cache")
    so.RESULTS = str(tmp_path / "ledger.json")

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    import duckdb

    duckdb.sql(
        f"copy (select range as r_regionkey, 'x' as r_name, 'y' as r_comment "
        f"from range(4)) to '{sf}/region.parquet' (format parquet)"
    )

    # a derivation that cannot finish in 1s: ~10^10-row cross join agg
    slow_sql = (
        "select count(*) as n from range(100000) a, range(100000) b, "
        "(select * from region)"
    )
    monkeypatch.setenv("ORACLE_DERIVE_TIMEOUT", "1")
    t0 = time.time()
    with pytest.raises(Exception) as exc:
        so.derive_oracle("slow_q", sf, slow_sql)
    assert time.time() - t0 < 30, "watchdog did not fire"
    assert "interrupt" in str(exc.value).lower()
    leftovers = [
        f for f in os.listdir(so.CACHE_DIR) if ".tmp." in f or f.endswith(".json")
    ]
    assert leftovers == [], leftovers

    # timeout unset -> the same path derives normally
    monkeypatch.delenv("ORACLE_DERIVE_TIMEOUT")
    pq_path, meta = so.derive_oracle(
        "fast_q", sf, "select count(*) as n from region"
    )
    assert meta["rows"] == 1 and os.path.exists(pq_path)
