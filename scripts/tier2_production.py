"""Fire the PRODUCTION tier thresholds on real data (round-9 verdict
item 2).

The tier-2 (96-hash, 8x12) geometry has been executed under a DuckDB
oracle since round 9 — but only via DEMONSTRATION thresholds that
shrink the switch points so 2k docs count themselves past the last
tier. This script observes the switch at the UNMODIFIED
``dedup.ADAPTIVE_GEOMETRY_TIERS``: it generates a >= 2M-document corpus
(401 deterministic replicas of the sf0.1 documents table through the
weak-scaling generator — same perturbation law as every scaled gate,
documents only), runs ``minhash_production_lsh`` against it, asserts
the in-result tier columns read (96, 8, 12) and the planted banding
cert is green, and gates the whole report against the DuckDB oracle
derived in bounded staged passes (scripts/scaled_oracle.py --staged;
staged == monolithic is hash-verified at smaller dirs before any
staged-only install is allowed).

Outcomes land in TIER2_PROD.json (summary) and SCALED_ORACLE.json
(ledger row under "prod2m").

Usage:
  python scripts/tier2_production.py                 # full gate
  python scripts/tier2_production.py --spark-only    # corpus + Spark +
                                                     # cert, skip oracle
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC_DIR = "/root/testdata/sf0.1"
CORPUS = os.path.join(REPO, "scaledata", "prod2m")
# 401 x 5,000 = 2,005,000 documents — strictly past the 2,000,000
# production threshold, so adaptive_minhash_geometry falls through to
# ADAPTIVE_GEOMETRY_TOP with no override anywhere
FACTOR = 401
RESULT = os.path.join(REPO, "TIER2_PROD.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spark-only", action="store_true")
    ap.add_argument("--factor", type=int, default=FACTOR)
    args = ap.parse_args()

    import pandas as pd

    import scaled_oracle
    from dbt_datbricks_demo_spark.operators import dedup
    from dbt_datbricks_demo_spark.testing.scaleup import scale_up_dir

    t0 = time.perf_counter()
    scale_up_dir(SRC_DIR, CORPUS, args.factor, tables=("documents",))
    gen_s = round(time.perf_counter() - t0, 1)

    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(
        os.path.join(CORPUS, "documents.parquet")
    ).metadata.num_rows
    geometry = dedup.adaptive_minhash_geometry(n_docs)
    print(f"corpus: {n_docs} docs (gen {gen_s}s), production tier {geometry}")
    if n_docs <= 2_000_000:
        raise SystemExit(f"corpus too small to exercise tier-2: {n_docs}")
    if geometry != dedup.ADAPTIVE_GEOMETRY_TOP:
        raise SystemExit(
            f"adaptive geometry chose {geometry}, not the top tier "
            f"{dedup.ADAPTIVE_GEOMETRY_TOP}"
        )

    from dbt_datbricks_demo_spark.queries import QUERIES
    from dbt_datbricks_demo_spark.session import get_spark

    name = "minhash_production_lsh"
    spec = QUERIES[name]

    spark = get_spark(
        app_name="tier2-production",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    sdf = spec.build(spark, CORPUS).toPandas()
    spark_s = round(time.perf_counter() - t0, 1)
    spark.stop()
    row = sdf.iloc[0].to_dict()
    print(f"spark: {spark_s}s -> {row}")

    summary = {
        "corpus": {
            "dir": os.path.relpath(CORPUS, REPO),
            "src": SRC_DIR,
            "factor": args.factor,
            "n_docs": int(n_docs),
            "gen_s": gen_s,
        },
        "thresholds": "UNMODIFIED dedup.ADAPTIVE_GEOMETRY_TIERS",
        "tier_selected": list(geometry),
        "spark_s": spark_s,
        "result": {
            k: int(v) if hasattr(v, "item") or isinstance(v, int) else v
            for k, v in row.items()
        },
        "checked_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    # the switch must be OBSERVED in the result, not inferred — and as
    # explicit checks, not asserts: under `python -O` asserts vanish
    # and the script would write TIER2_PROD.json with
    # planted_cert_green=True even if the tier never switched
    observed = (
        int(row["n_hashes"]),
        int(row["n_bands"]),
        int(row["rows_per_band"]),
    )
    if observed != dedup.ADAPTIVE_GEOMETRY_TOP:
        raise SystemExit(
            f"tier-2 geometry did not fire: observed {observed}, "
            f"expected {dedup.ADAPTIVE_GEOMETRY_TOP}; row={row}"
        )
    if int(row["cert_band_hits"]) != int(row["cert_planted"]):
        raise SystemExit(
            f"planted-pair recall cert failed: "
            f"{row['cert_band_hits']}/{row['cert_planted']}; row={row}"
        )
    summary["planted_cert_green"] = True

    if not args.spark_only:
        sql = spec.oracle
        stages = scaled_oracle._staged_plans()[name]()
        t0 = time.perf_counter()
        pq_path, meta = scaled_oracle.derive_oracle_staged(
            name, CORPUS, sql, stages
        )
        odf = pd.read_parquet(pq_path)
        from oracle_harness import compare

        problems = compare(name, sdf, odf)
        outcome = {
            "match": not problems,
            "rows": len(sdf),
            "spark_s": spark_s,
            "oracle_key": meta["key"],
            "oracle_derive_s": meta["derive_s"],
            "derivation": meta.get("derivation", "monolithic"),
            "staged_verified_against": [
                v["sf_dir"] for v in meta.get("staged_verified_against", [])
            ],
            "production_thresholds": True,
            "checked_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        }
        scaled_oracle.record(name, CORPUS, outcome)
        summary["oracle"] = outcome
        if problems:
            print(f"FAIL {problems[:5]}")
            return 1
        print(
            f"OK {name} @ prod2m: hash-green at production thresholds "
            f"(oracle derive {meta['derive_s']}s)"
        )

    with open(RESULT, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"wrote {RESULT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
