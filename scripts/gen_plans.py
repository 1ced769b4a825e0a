"""Regenerate PLANS.md: formatted physical plans of the headline
queries with one-line annotations. Run from the repo root."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from dbt_datbricks_demo_spark.session import get_spark  # noqa: E402
from dbt_datbricks_demo_spark.queries import QUERIES  # noqa: E402

HEADLINE = {
    "pricing_summary": "A1/A2 hash agg: pushdown + pruning + partial/final agg",
    "enrich_broadcast": "J1/J2 dim enrichment: BroadcastHashJoin, pruned dim scan",
    "dedup_keep_latest": "W1 keep-latest: WindowGroupLimit map-side pre-filter",
    "topk_orders": "O1-O4 top-k: TakeOrderedAndProject, no global sort",
    "shipping_priority": "TPC-H Q3 shape: 3-way broadcast join -> agg -> top-k",
    "minhash_lsh_jaccard": "LSH banding: ReusedExchange, ids+hashes only",
    "ann_ivf_fixed_topk": "IVF probe: cell routing (see also write_ivf_index PartitionFilters)",
    "quality_deciles": "distributed exact ntile: histogram + rank intervals, no global window",
    "vocabulary_report": "token explosion absorbed by map-side partial agg",
    "gap_fill_interpolate": "time-series gapfill: running frames only (no O(n^2) unbounded-following)",
    "salted_hot_key_agg": "skew defense: two-phase salted aggregation",
    "funnel_report": "ordered funnel: one shuffle + in-plan fold state machine",
    "late_shipment_priority": "TPC-H Q4 shape: correlated EXISTS as one left-semi join",
    "sole_late_supplier": "TPC-H Q21 shape: EXISTS/NOT EXISTS pair as ONE window pass",
    "top_customer_share": "TPC-H Q11 shape: scalar-subquery HAVING, AQE ReusedExchange",
    "unigram_perplexity_report": "unigram-LM scoring: two partial-agg passes, term join, 1-row totals broadcast",
    "semdedup_report": "SemDeDup (r7 adaptive k): narrow coarse+sub-plane assignment -> per-cell pairs -> anti join",
    "semantic_decontam_report": "embedding decontam: bounded benchmark broadcast, one corpus pass",
    "duplicate_span_report": "ExactSubstr: ONE gram explode, digest window totals, narrow fold",
    "decontam_report": "n-gram decontam: explode_outer + broadcast digest probe, map-side partial agg",
    "table_profile_report": "column profile: ONE scan, Expand multi-distinct, stack unpivot",
    "regression_trend_report": "closed-form OLS: broadcast dims, exact decimal sums, partial agg",
    "hard_negative_mining": "negative sampling: bounded anchor broadcast, WindowGroupLimit top-k",
    "span_removal_report": "ExactSubstr removal: one codegen gram explode, combiner pre-agg, dup-bounded span expansion",
    "domain_cap_report": "per-domain cap: WindowGroupLimit map-side top-K, broadcast totals join-back",
    "domain_blocklist_report": "host blocklist: broadcast table join, map-side funnel agg",
    "ann_batch_topk": "batch ANN via the standing IVF-PQ index (r7): broadcast (cell,sub) grid probe over codes-only scans, WindowGroupLimit per-query top-k, broadcast cert attach",
    "adaptive_band_dedup_report": "adaptive LSH banding (r7): count-derived geometry, banded candidates, exact-Jaccard verify",
    "minhash_index_lookup": "standing-index probe: bucket-pruned index scan + band-key equi-join",
    "minhash_index_maintenance": "standing-index lifecycle: post-compaction probe — same pruned scan over the rewritten one-file-per-bucket layout",
    "dsir_importance_report": "DSIR: fixed-bucket model broadcast probe, one-row totals attach, TakeOrderedAndProject top-25",
    "bloom_decontam_report": "Bloom probe: bounded (m/32)-row filter broadcast, k-bit fold with map-side combine",
    "token_budget_selection": "budget prefix: band-partitioned running sum + tiny cumulated offset table, no global window",
    "leakage_safe_split": "leakage-safe split: checkpointed edge set feeds components + the cross-split certification count",
}

HEADER = """# PLANS — physical-plan evidence for the headline operators

Generated from `.explain("formatted")` at sf0.001 (plan SHAPE is scale-
independent; AQE adjusts sizes at runtime). The same shapes are pinned
as regression tests in `tests/test_plans.py` — this file is the human-
readable audit trail. Regenerate: `python scripts/gen_plans.py`.
"""


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out = [HEADER]
    for name, why in HEADLINE.items():
        df = QUERIES[name].build(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().explainString(mode)
        head = plan.split("\n\n")[0]
        out.append(f"## {name}\n\n*{why}*\n\n```\n{head}\n```\n")
    open("/root/repo/PLANS.md", "w").write("\n".join(out))
    print("PLANS.md regenerated")


if __name__ == "__main__":
    main()
