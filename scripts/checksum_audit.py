"""Checksum-eligibility audit over the full query registry (round-11
verdict item 4).

The scaled-oracle gate (scripts/scaled_oracle.py --checksum) REFUSES
results outside the distributed checksum's canonicalization contract
(testing/checksum.py: non-scalar columns, decimals, NaN/Inf-capable or
|x| >= 9e15 floats, sentinel-bearing strings) and falls back to the
exact driver compare — which pulls the full result through toPandas().
That fallback is correct at small scales but silently DRIVER-BOUND at
x100: a refused query's "scaled" cell would quietly cost O(rows) driver
memory. This audit makes refusability explicit: for every registered
query it builds the result plan at the smoke scale, classifies the
schema against the checksum contract, and writes CHECKSUM_AUDIT.json +
the pinned table in SCALE.md. tests/test_scale.py pins the artifact
against the live registry, so adding a query without re-auditing fails
the suite.

Schema-level refusal is PERMANENT (the column types can never hash);
value-level refusal (a NaN shows up at some scale) stays a runtime
fallback and is already recorded per-cell in SCALED_ORACLE.json's
`gate` field.

Usage: python scripts/checksum_audit.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARTIFACT = os.path.join(REPO, "CHECKSUM_AUDIT.json")
SF_DEFAULT = "/root/testdata/sf0.001"


def classify(df) -> tuple[str, str]:
    """(status, detail) for a result DataFrame's schema: 'eligible' or
    'refused' with the offending column list. Delegates to the live
    contract (testing/checksum.spark_families — which since round 12
    canonicalizes arrays of int/float/str scalars) so the audit can
    never disagree with what the gate actually accepts."""
    from dbt_datbricks_demo_spark.testing.checksum import spark_families

    if spark_families(df) is not None:
        return "eligible", ""
    # name the offending columns: re-classify one column at a time
    bad = [
        f"{name}:{dtype}"
        for name, dtype in df.dtypes
        if spark_families(df.select(name)) is None
    ]
    return "refused", ", ".join(bad)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=SF_DEFAULT)
    args = ap.parse_args()

    from dbt_datbricks_demo_spark.queries import QUERIES
    from dbt_datbricks_demo_spark.session import get_spark

    spark = get_spark(
        app_name="checksum-audit",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    audit: dict[str, dict] = {}
    for name, spec in sorted(QUERIES.items()):
        try:
            df = spec.build(spark, args.sf)
            status, detail = classify(df)
        except Exception as e:  # noqa: BLE001
            status, detail = "error", f"{type(e).__name__}: {e}"[:200]
        entry = {"status": status}
        if detail:
            entry["detail"] = detail
        audit[name] = entry
        if status != "eligible":
            print(f"  {name}: {status} ({detail})", flush=True)

    n_eligible = sum(1 for v in audit.values() if v["status"] == "eligible")
    n_refused = sum(1 for v in audit.values() if v["status"] == "refused")
    n_error = len(audit) - n_eligible - n_refused
    out = {
        "sf": args.sf,
        "checked_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_queries": len(audit),
        "n_eligible": n_eligible,
        "n_refused": n_refused,
        "n_error": n_error,
        "queries": audit,
    }
    with open(ARTIFACT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        f"audit: {len(audit)} queries, {n_eligible} checksum-eligible, "
        f"{n_refused} schema-refused, {n_error} errors -> {ARTIFACT}"
    )
    spark.stop()
    return 1 if n_error else 0


if __name__ == "__main__":
    sys.exit(main())
