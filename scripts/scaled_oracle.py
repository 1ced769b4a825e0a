"""Resumable scaled-oracle gate (round-9 verdict item 2).

The x30/x100 DuckDB derivations for the heaviest composite queries
(leakage_safe_split at x100; training_set_report / corpus_pipeline at
x30) exceeded a single judge/driver session budget in round 8, leaving
their scaled points timing-only. This harness makes the derivation a
ONE-TIME cost: the oracle result is derived once per (query, data-dir
manifest, oracle-SQL text) key, persisted as parquet under
``scaledata/oracle_cache/``, and every later run — this session or any
future one — compares the Spark side against the cached result
instantly. Editing the oracle SQL or regenerating the data dir changes
the key and forces a fresh derivation, so the cache can never serve a
stale expectation.

The comparison is the exact driver gate (tests/oracle_harness.compare:
sorted columns, sorted rows, exact floats) by default. With
``--checksum`` (round-10 verdict item 1) it is instead the distributed
order-insensitive checksum (testing/checksum.py): each engine reduces
its own result to (row count, two 60-bit md5-chunk sums) internally,
so NO result rows ever ride to the driver — O(1) driver memory at any
scale, which is what made the 100M-row x100 cells affordable. Results
outside the checksum's precision contract are refused and fall back
to the exact compare; the `gate` field of every ledger row records
which gate produced it. Outcomes append into ``SCALED_ORACLE.json``
at the repo root with rows/derive-wall metadata so SCALE.md can cite
hash-green scaled points with their provenance.

Usage:
  python scripts/scaled_oracle.py --sf scaledata/x100 leakage_safe_split
  python scripts/scaled_oracle.py --sf scaledata/x30 \
      training_set_report corpus_pipeline
  ORACLE_ONLY=1 ... # derive/cache the DuckDB side, skip Spark+compare
  SPARK_ONLY=1  ... # compare against an existing cache entry or fail
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from oracle_harness import TABLES, compare  # noqa: E402

CACHE_DIR = os.path.join(REPO, "scaledata", "oracle_cache")
RESULTS = os.path.join(REPO, "SCALED_ORACLE.json")


def _dir_stamp(sf_dir: str) -> str:
    """Content stamp of a data dir: the scaleup manifest when present
    (pins src/factor/generator version), else per-table size+mtime."""
    man = os.path.join(sf_dir, "manifest.json")
    if os.path.exists(man):
        with open(man) as fh:
            return json.dumps(json.load(fh), sort_keys=True)
    parts = []
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue  # subset dirs (e.g. the documents-only 2M corpus)
        st = os.stat(p)
        parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def cache_key(name: str, sf_dir: str, sql: str) -> str:
    return hashlib.md5(
        f"{name}|{_dir_stamp(sf_dir)}|{sql}".encode()
    ).hexdigest()[:16]


def _sq(path: str) -> str:
    """Escape a path for embedding in a single-quoted DuckDB SQL
    literal (round-9 advice: a path containing ' broke the SET /
    read_parquet statements)."""
    return path.replace("'", "''")


def _spill_cap_bytes() -> int:
    """Spill cap: ORACLE_TEMP_MAX wins; otherwise 80% of the FREE disk
    at the cache dir (round-9 advice: the old hard-coded 60GB default
    assumed headroom a smaller host doesn't have), floored at 1GB so a
    nearly-full disk still lets tiny derivations run."""
    env = os.environ.get("ORACLE_TEMP_MAX")
    if env:
        units = {"KB": 10**3, "MB": 10**6, "GB": 10**9, "TB": 10**12}
        for suffix, mult in units.items():
            if env.upper().endswith(suffix):
                return int(float(env[: -len(suffix)]) * mult)
        return int(env)
    import shutil

    os.makedirs(CACHE_DIR, exist_ok=True)
    free = shutil.disk_usage(CACHE_DIR).free
    return max(int(free * 0.8), 10**9)


def _connect_spill_capped():
    """A DuckDB connection whose spill is pinned into the cache dir and
    capped below the free-disk headroom, so a runaway derivation
    aborts itself instead of filling the filesystem under every other
    process (learned the hard way: an uncapped spill took the whole
    disk to zero mid-bench). Overridable via ORACLE_TEMP_DIR /
    ORACLE_TEMP_MAX."""
    con = duckdb.connect()
    tmp_dir = os.environ.get(
        "ORACLE_TEMP_DIR", os.path.join(CACHE_DIR, ".duckdb_tmp")
    )
    os.makedirs(tmp_dir, exist_ok=True)
    con.execute(f"set temp_directory='{_sq(tmp_dir)}'")
    con.execute(f"set max_temp_directory_size='{_spill_cap_bytes()}B'")
    return con


def _register_base_views(con, sf_dir: str) -> None:
    for t in TABLES:
        p = os.path.join(os.path.abspath(sf_dir), f"{t}.parquet")
        if not os.path.exists(p):
            continue  # subset dirs (e.g. the documents-only 2M corpus)
        con.sql(
            f"create view {t} as select * from read_parquet('{_sq(p)}')"
        )


def derive_oracle(name: str, sf_dir: str, sql: str) -> tuple[str, dict]:
    """Return (parquet path, meta) for the cached oracle result,
    deriving it with DuckDB if this (query, dir, sql) key is new.
    The derivation COPYs straight to parquet — the result never rides
    through pandas, so a multi-GB derivation spills in DuckDB and the
    cache write is streaming."""
    key = cache_key(name, sf_dir, sql)
    os.makedirs(CACHE_DIR, exist_ok=True)
    pq = os.path.join(CACHE_DIR, f"{name}_{key}.parquet")
    meta_path = os.path.join(CACHE_DIR, f"{name}_{key}.json")
    if os.path.exists(pq) and os.path.exists(meta_path):
        with open(meta_path) as fh:
            return pq, json.load(fh)
    con = _connect_spill_capped()
    _register_base_views(con, sf_dir)
    t0 = time.perf_counter()
    tmp = pq + f".tmp.{os.getpid()}"
    # optional derivation watchdog (round 12): in a multi-query sweep
    # one pathological derivation (a quadratic fuzzy-match, an
    # optimizer mis-plan) must not consume the whole run's budget —
    # ORACLE_DERIVE_TIMEOUT seconds, enforced via con.interrupt() from
    # a watchdog thread; the interrupted execute raises, the caller's
    # fault isolation records the error and moves on. Unset = no limit
    # (single-query runs keep today's behavior).
    limit = float(os.environ.get("ORACLE_DERIVE_TIMEOUT", "0") or 0)
    watchdog = None
    if limit > 0:
        import threading

        watchdog = threading.Timer(limit, con.interrupt)
        watchdog.daemon = True
        watchdog.start()
    try:
        con.execute(f"copy ({sql}) to '{_sq(tmp)}' (format parquet)")
    except Exception:
        # interrupted/failed derivation: drop the partial tmp so a
        # retry never replaces the cache with a truncated parquet
        import contextlib

        with contextlib.suppress(FileNotFoundError):
            os.unlink(tmp)
        raise
    finally:
        if watchdog is not None:
            watchdog.cancel()
        con.close()
    os.replace(tmp, pq)
    meta = {
        "key": key,
        "sf_dir": os.path.abspath(sf_dir),
        "derive_s": round(time.perf_counter() - t0, 1),
        "rows": int(len(pd.read_parquet(pq, columns=[]))),
        "derived_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, indent=1)
    return pq, meta


def _staged_plans() -> dict:
    """Queries whose oracle can be derived in bounded passes. The plan
    is a DERIVATION STRATEGY only — the cache key stays the monolithic
    oracle-SQL text, and derive_oracle_staged refuses to install a
    staged result for that key until the staged pipeline has been
    hash-verified against an existing MONOLITHIC cache entry at this
    or a smaller scale (tracked in the stage meta)."""
    from dbt_datbricks_demo_spark.operators import dedup
    from dbt_datbricks_demo_spark.queries.llm_ops import (
        staged_knee_report_sql,
    )
    from dbt_datbricks_demo_spark.queries.pipeline_ops import (
        staged_training_set_sql,
    )
    from dbt_datbricks_demo_spark.queries.training_ops import (
        staged_doremi_sql,
    )

    return {
        "training_set_report": staged_training_set_sql,
        "minhash_production_lsh": lambda: staged_knee_report_sql(
            top=dedup.ADAPTIVE_GEOMETRY_TOP
        ),
        "doremi_mixture_report": staged_doremi_sql,
    }


def derive_oracle_staged(
    name: str, sf_dir: str, sql: str, stages: list[tuple[str, str]]
) -> tuple[str, dict]:
    """Like derive_oracle, but one DuckDB connection PER STAGE with
    each stage's output persisted to parquet and registered as a view
    for later stages — peak spill is a single stage's working set, not
    the whole derivation's (round-9 verdict item 1: the monolithic
    x100 training_set_report spill needed ~150 GB against ~77 free).
    Stages are cached under their own keys (stage SQL + upstream
    keys + dir stamp), so an interrupted derivation resumes at the
    first un-derived stage. The final stage installs under the SAME
    cache key as the monolithic SQL, with meta recording the staged
    provenance and per-stage walls."""
    key = cache_key(name, sf_dir, sql)
    os.makedirs(CACHE_DIR, exist_ok=True)
    pq = os.path.join(CACHE_DIR, f"{name}_{key}.parquet")
    meta_path = os.path.join(CACHE_DIR, f"{name}_{key}.json")
    monolithic_cached = os.path.exists(pq) and os.path.exists(meta_path)
    if monolithic_cached:
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("derivation") == "staged" or meta.get("staged_verified"):
            return pq, meta
        # a MONOLITHIC entry exists: run the staged pipeline anyway and
        # hash-verify it against that entry — this is the evidence that
        # lets a later, bigger scale trust the staged plan
    stamp = _dir_stamp(sf_dir)
    stage_dir = os.path.join(CACHE_DIR, "stages")
    os.makedirs(stage_dir, exist_ok=True)
    upstream_key = ""
    stage_walls: dict[str, float] = {}
    stage_paths: dict[str, str] = {}
    final_path = None
    for sname, ssql in stages:
        skey = hashlib.md5(
            f"{name}|{sname}|{stamp}|{ssql}|{upstream_key}".encode()
        ).hexdigest()[:16]
        upstream_key = skey
        spath = os.path.join(stage_dir, f"{name}_{sname}_{skey}.parquet")
        if not os.path.exists(spath):
            con = _connect_spill_capped()
            _register_base_views(con, sf_dir)
            for prev, ppath in stage_paths.items():
                con.sql(
                    f"create view {prev} as select * from "
                    f"read_parquet('{_sq(ppath)}')"
                )
            t0 = time.perf_counter()
            tmp = spath + f".tmp.{os.getpid()}"
            con.execute(f"copy ({ssql}) to '{_sq(tmp)}' (format parquet)")
            con.close()
            os.replace(tmp, spath)
            stage_walls[sname] = round(time.perf_counter() - t0, 1)
            print(
                f"  stage {sname}: "
                f"{int(pd.read_parquet(spath, columns=[]).shape[0])} rows, "
                f"{stage_walls[sname]}s",
                flush=True,
            )
        else:
            stage_walls[sname] = 0.0
        stage_paths[sname] = spath
        final_path = spath
    import shutil

    marker = os.path.join(CACHE_DIR, f"staged_verified_{name}.json")
    verified: list[dict] = []
    if os.path.exists(marker):
        with open(marker) as fh:
            verified = json.load(fh)
    if monolithic_cached:
        # hash-verify staged vs the monolithic entry (exact compare —
        # the driver-gate semantics, not a float tolerance)
        sdf = pd.read_parquet(final_path)
        odf = pd.read_parquet(pq)
        problems = compare(name, sdf, odf)
        if problems:
            raise SystemExit(
                f"staged derivation DIVERGES from the monolithic cache "
                f"for {name} @ {sf_dir}: {problems[:5]}"
            )
        entry = {
            "sf_dir": os.path.basename(os.path.abspath(sf_dir)),
            "rows": int(len(sdf)),
            "verified_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        }
        if entry["sf_dir"] not in {v["sf_dir"] for v in verified}:
            verified.append(entry)
            with open(marker, "w") as fh:
                json.dump(verified, fh, indent=1)
        with open(meta_path) as fh:
            meta = json.load(fh)
        meta["staged_verified"] = True
        with open(meta_path, "w") as fh:
            json.dump(meta, fh, indent=1)
        print(
            f"staged {name} @ {sf_dir}: hash-equal to the monolithic "
            f"cache entry ({len(sdf)} rows)",
            flush=True,
        )
        return pq, meta
    if not verified:
        raise SystemExit(
            f"refusing to install a staged oracle for {name}: no "
            f"staged-vs-monolithic verification on record — run with "
            f"--staged at a scale whose monolithic entry is cached "
            f"first (marker: {marker})"
        )
    tmp = pq + f".tmp.{os.getpid()}"
    shutil.copyfile(final_path, tmp)
    os.replace(tmp, pq)
    meta = {
        "key": key,
        "sf_dir": os.path.abspath(sf_dir),
        "derive_s": round(sum(stage_walls.values()), 1),
        "rows": int(len(pd.read_parquet(pq, columns=[]))),
        "derived_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "derivation": "staged",
        "stage_walls": stage_walls,
        "staged_verified_against": verified,
    }
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, indent=1)
    return pq, meta


def derive_oracle_staged_standalone(
    name: str, sf_dir: str, key_text: str, stages: list[tuple[str, str]]
) -> tuple[str, dict]:
    """Staged derivation for a query whose oracle exists ONLY as a
    staged plan (no monolithic SQL is registered — e.g. the prod2m
    lifecycle probe, whose stage SQL embeds per-corpus planted ids).
    The staged-vs-monolithic verification discipline of
    derive_oracle_staged does not apply; callers must validate the
    SAME staged plan with the exact compare at a small corpus first
    (tests/test_staged_oracle.py does, for every registered plan).
    Caching follows derive_oracle: key = (name, dir stamp, key_text),
    per-stage resumability included."""
    key = cache_key(name, sf_dir, key_text)
    os.makedirs(CACHE_DIR, exist_ok=True)
    pq = os.path.join(CACHE_DIR, f"{name}_{key}.parquet")
    meta_path = os.path.join(CACHE_DIR, f"{name}_{key}.json")
    if os.path.exists(pq) and os.path.exists(meta_path):
        with open(meta_path) as fh:
            return pq, json.load(fh)
    stamp = _dir_stamp(sf_dir)
    stage_dir = os.path.join(CACHE_DIR, "stages")
    os.makedirs(stage_dir, exist_ok=True)
    upstream_key = ""
    stage_walls: dict[str, float] = {}
    stage_paths: dict[str, str] = {}
    final_path = None
    for sname, ssql in stages:
        skey = hashlib.md5(
            f"{name}|{sname}|{stamp}|{ssql}|{upstream_key}".encode()
        ).hexdigest()[:16]
        upstream_key = skey
        spath = os.path.join(stage_dir, f"{name}_{sname}_{skey}.parquet")
        if not os.path.exists(spath):
            con = _connect_spill_capped()
            _register_base_views(con, sf_dir)
            for prev, ppath in stage_paths.items():
                con.sql(
                    f"create view {prev} as select * from "
                    f"read_parquet('{_sq(ppath)}')"
                )
            t0 = time.perf_counter()
            tmp = spath + f".tmp.{os.getpid()}"
            con.execute(f"copy ({ssql}) to '{_sq(tmp)}' (format parquet)")
            con.close()
            os.replace(tmp, spath)
            stage_walls[sname] = round(time.perf_counter() - t0, 1)
            print(
                f"  stage {sname}: "
                f"{int(pd.read_parquet(spath, columns=[]).shape[0])} rows, "
                f"{stage_walls[sname]}s",
                flush=True,
            )
        else:
            stage_walls[sname] = 0.0
        stage_paths[sname] = spath
        final_path = spath
    import shutil

    tmp = pq + f".tmp.{os.getpid()}"
    shutil.copyfile(final_path, tmp)
    os.replace(tmp, pq)
    meta = {
        "key": key,
        "sf_dir": os.path.abspath(sf_dir),
        "derive_s": round(sum(stage_walls.values()), 1),
        "rows": int(len(pd.read_parquet(pq, columns=[]))),
        "derived_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "derivation": "staged-standalone",
        "stage_walls": stage_walls,
    }
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, indent=1)
    return pq, meta


def record(name: str, sf_dir: str, outcome: dict) -> None:
    results = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            results = json.load(fh)
    results.setdefault(name, {})[os.path.basename(sf_dir.rstrip("/"))] = outcome
    with open(RESULTS, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument(
        "--staged",
        action="store_true",
        help="derive via the bounded per-stage plan where one is "
        "registered (verifies against the monolithic cache when that "
        "entry exists; installs only after a recorded verification)",
    )
    ap.add_argument(
        "--checksum",
        action="store_true",
        help="compare via the distributed order-insensitive checksum "
        "(testing/checksum.py): each engine reduces its own result to "
        "(row count, two 60-bit md5-chunk sums) — O(1) driver memory, "
        "no toPandas pull. Results outside the checksum's precision "
        "contract are refused and fall back to the exact compare.",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    queries = entry.queries()
    oracle_only = os.environ.get("ORACLE_ONLY") == "1"
    spark_only = os.environ.get("SPARK_ONLY") == "1"

    rc = 0
    spark = None
    for name in args.queries:
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP   {name}: no oracle registered")
            continue
        if spark_only:
            key = cache_key(name, args.sf, sql)
            pq = os.path.join(CACHE_DIR, f"{name}_{key}.parquet")
            meta_path = pq.removesuffix(".parquet") + ".json"
            if not os.path.exists(pq):
                print(f"ERROR  {name}: no cached oracle for key {key}")
                rc = 1
                continue
            with open(meta_path) as fh:
                meta = json.load(fh)
        else:
            # fault-isolated per query (round 11): one pathological
            # derivation (decimal overflow, spill-cap abort) must not
            # kill the rest of a multi-query run — record and continue
            try:
                if args.staged and name in _staged_plans():
                    stages = _staged_plans()[name]()
                    pq, meta = derive_oracle_staged(
                        name, args.sf, sql, stages
                    )
                else:
                    pq, meta = derive_oracle(name, args.sf, sql)
            except (SystemExit, KeyboardInterrupt):
                raise
            except Exception as exc:  # noqa: BLE001
                rc = 1
                msg = f"{type(exc).__name__}: {exc}"[:500]
                print(f"ERROR  {name}: oracle derivation failed: {msg}")
                record(
                    name,
                    args.sf,
                    {
                        "match": False,
                        "error": msg,
                        "phase": "oracle_derivation",
                        "checked_at": time.strftime(
                            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                        ),
                    },
                )
                continue
            print(
                f"oracle {name}: {meta['rows']} rows, "
                f"derive {meta['derive_s']}s (key {meta['key']})",
                flush=True,
            )
        if oracle_only:
            continue
        if spark is None:
            from dbt_datbricks_demo_spark.session import get_spark

            spark = get_spark(
                app_name="scaled-oracle",
                extra_conf={"spark.ui.showConsoleProgress": "false"},
            )
            spark.sparkContext.setLogLevel("ERROR")
        gate = "exact"
        try:
            if args.checksum:
                from dbt_datbricks_demo_spark.testing.checksum import (
                    checksum_compare,
                    duckdb_checksum,
                    spark_checksum,
                )

                t0 = time.perf_counter()
                scs = spark_checksum(queries[name](spark, args.sf))
                spark_s = round(time.perf_counter() - t0, 1)
                if "refused" in scs:
                    print(
                        f"       checksum refused ({scs['refused']}); "
                        f"falling back to the exact compare"
                    )
                else:
                    con = _connect_spill_capped()
                    ocs = duckdb_checksum(
                        con, f"select * from read_parquet('{_sq(pq)}')"
                    )
                    con.close()
                    if "refused" in ocs:
                        print(
                            f"       oracle-side checksum refused "
                            f"({ocs['refused']}); falling back to exact"
                        )
                    else:
                        gate = "checksum"
                        problems = checksum_compare(scs, ocs)
                        n_rows = scs["n"]
            if gate == "exact":
                t0 = time.perf_counter()
                sdf = queries[name](spark, args.sf).toPandas()
                spark_s = round(time.perf_counter() - t0, 1)
                odf = pd.read_parquet(pq)
                problems = compare(name, sdf, odf)
                n_rows = len(sdf)
        except (SystemExit, KeyboardInterrupt):
            raise
        except Exception as exc:  # noqa: BLE001
            rc = 1
            msg = f"{type(exc).__name__}: {exc}"[:500]
            print(f"ERROR  {name}: spark side failed: {msg}")
            record(
                name,
                args.sf,
                {
                    "match": False,
                    "error": msg,
                    "phase": "spark_gate",
                    "checked_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    ),
                },
            )
            continue
        outcome = {
            "match": not problems,
            "rows": n_rows,
            "gate": gate,
            "spark_s": spark_s,
            "oracle_key": meta["key"],
            "oracle_derive_s": meta["derive_s"],
            "checked_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        }
        if meta.get("derivation") == "staged":
            # staged provenance is visible in the ledger: the oracle
            # was derived in bounded passes and installed only after a
            # staged-vs-monolithic hash verification on record
            outcome["derivation"] = "staged"
            outcome["staged_verified_against"] = [
                v["sf_dir"]
                for v in meta.get("staged_verified_against", [])
            ]
        if problems:
            outcome["problems"] = problems[:5]
            rc = 1
            print(f"FAIL   {name} @ {args.sf}")
            for p in problems:
                print(f"       {p}")
        else:
            print(
                f"OK[{gate}] {name} @ {args.sf} ({n_rows} rows, "
                f"spark {spark_s}s, oracle {meta['derive_s']}s cached)"
            )
        record(name, args.sf, outcome)
    if spark is not None:
        spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
