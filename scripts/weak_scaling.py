"""Weak-scaling harness: measured time-ratio curves for the heaviest
queries at 1×/3×/10× the sf0.1 data (round-6 verdict item 1).

Generates deterministic scaled replicas of /root/testdata/sf0.1 via
``testing.scaleup.scale_up_dir`` (DuckDB-side, oracle-compatible — see
tests/test_scaleup.py), then times each query with the exact bench.py
methodology (one JVM, warmup pass, best-of-N with unpersist + GC
quiesce between runs) at every scale, and publishes the measured
ratios into SCALE.md between the weak-scaling markers.

A ratio near the data factor (≤ ~1.2× the factor) is linear; anything
above earns a plan fix or a root-cause note in SCALE.md.

Usage:
  python scripts/weak_scaling.py            # 1x/3x/10x, 3 runs each
  WS_SCALES=1,3 WS_RUNS=2 python scripts/weak_scaling.py
  WS_QUERIES=simhash_docs,sketch_report python scripts/weak_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _gc_quiesce, _unpersist_all  # noqa: E402
from dbt_datbricks_demo_spark.queries import QUERIES  # noqa: E402
from dbt_datbricks_demo_spark.session import get_spark  # noqa: E402
from dbt_datbricks_demo_spark.testing.scaleup import scale_up_dir  # noqa: E402

# the round-5 bench's 15 slowest queries, plus the flagship dedup /
# similarity / curation surfaces whose 100-TB linearity SCALE.md argues
DEFAULT_QUERIES = [
    "training_set_report",
    "corpus_pipeline",
    "neardup_components",
    "gap_fill_interpolate",
    "simhash_docs",
    "containment_dedup_report",
    "sketch_report",
    "table_profile_report",
    "incremental_dedup_report",
    "semdedup_report",
    "decontam_report",
    "scd2_snapshot",
    "product_type_profit",
    "label_propagation_eval",
    "span_removal_report",
    # flagship extras
    "minhash_lsh_jaccard",
    "exact_dedup_docs",
    "embedding_neardup_pairs",
    "bm25_search",
    "sessionize_events",
    "domain_cap_report",
    "ann_batch_topk",
    # round-6 selection surface (the two heaviest members)
    "leakage_safe_split",
    "bloom_decontam_report",
    # round-6 continuation mining surface
    "ann_pq_adc_topk",
    "ngram_diversity_report",
    "bigram_lm_report",
    "doremi_mixture_report",
    "ann_ivfpq_topk",
    "bpe_merge_training",
    "length_bucket_batching_report",
    "zipf_fit_report",
    "source_overlap_matrix",
    "quality_threshold_curve",
    "bpe_encode_report",
    "truncated_embedding_recall",
    # round 7: the adaptive-banding conversion (the executed form of
    # the 30x root-cause note)
    "adaptive_band_dedup_report",
    # round 8: the batch-index lifecycle probe
    "ann_index_maintenance",
]

MARK_BEGIN = "<!-- weak-scaling:begin (scripts/weak_scaling.py) -->"
MARK_END = "<!-- weak-scaling:end -->"


def data_dir(scale: int, base_dir: str) -> str:
    if scale == 1:
        return base_dir
    return scale_up_dir(
        base_dir, os.path.join(REPO, "scaledata", f"x{scale}"), scale
    )


def time_queries(
    spark, names: list[str], sf_dir: str, runs: int
) -> dict[str, float]:
    """bench.py methodology: every query once per sweep, best-of-N."""
    all_runs: dict[str, list[float]] = {}
    for _ in range(runs):
        for name in names:
            t0 = time.perf_counter()
            try:
                QUERIES[name].build(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                elapsed = round(time.perf_counter() - t0, 3)
                all_runs.setdefault(name, []).append(elapsed)
            except Exception as e:  # noqa: BLE001
                print(f"ERROR {name} @ {sf_dir}: {e}", file=sys.stderr)
                all_runs.pop(name, None)
                continue
            finally:
                try:
                    _unpersist_all(spark)
                except Exception:  # noqa: BLE001
                    pass
                _gc_quiesce(spark)
    return {n: min(ts) for n, ts in all_runs.items()}


def render_markdown(
    scales: list[int], timings: dict[int, dict[str, float]], runs: int
) -> str:
    base = timings[scales[0]]
    others = scales[1:]
    header = (
        "| query | "
        + " | ".join(f"t({s}×) s" for s in scales)
        + " | "
        + " | ".join(f"ratio {s}×" for s in others)
        + " |"
    )
    sep = "|" + "---|" * (len(scales) + len(others) + 1)
    lines = [
        MARK_BEGIN,
        "",
        f"Measured weak-scaling curve: best-of-{runs} wall time per "
        "query on the deterministic DuckDB-generated replicas "
        "(`testing/scaleup.py`; oracle-verified — the Spark-vs-DuckDB "
        "gate passes on the scaled dirs, tests/test_scaleup.py), "
        "local[32], same JVM and bench.py methodology at every scale. "
        "`ratio k×` = t(k×)/t(1×); linear = ratio ≈ k. Sub-linear "
        "ratios on sub-second queries are fixed per-query overhead "
        "(job scheduling, plan compile) amortizing, not super-powers.",
        "",
        header,
        sep,
    ]
    for name in sorted(base, key=lambda n: -base[n]):
        t1 = base[name]
        cells = [
            f"{timings[s][name]:.2f}" if name in timings[s] else "—"
            for s in scales
        ]
        ratios = [
            (
                f"{timings[s][name] / t1:.1f}"
                if name in timings[s] and t1 > 0
                else "—"
            )
            for s in others
        ]
        lines.append(
            f"| `{name}` | " + " | ".join(cells) + " | " + " | ".join(ratios) + " |"
        )
    # each total-column sums the queries measured at that scale; each
    # ratio divides by the MATCHED-subset base sum, so a scale column
    # covering only the slowest queries (e.g. the 30x point) gets an
    # honest like-for-like ratio instead of skewing the headline
    tot_cells, ratio_cells = [], []
    for s in scales:
        names_s = [n for n in timings[s] if n in base]
        tot_cells.append(
            f"**{sum(timings[s][n] for n in names_s):.1f}**"
            + ("" if len(names_s) == len(base) else f" ({len(names_s)}q)")
        )
    for s in others:
        names_s = [n for n in timings[s] if n in base]
        bsum = sum(base[n] for n in names_s)
        ratio_cells.append(
            f"**{sum(timings[s][n] for n in names_s) / bsum:.1f}**"
            if bsum > 0
            else "—"
        )
    lines.append(
        "| **total (matched)** | "
        + " | ".join(tot_cells)
        + " | "
        + " | ".join(ratio_cells)
        + " |"
    )
    lines += ["", MARK_END]
    return "\n".join(lines)


def update_scale_md(block: str) -> None:
    path = os.path.join(REPO, "SCALE.md")
    with open(path) as fh:
        content = fh.read()
    if MARK_BEGIN in content:
        pre = content.split(MARK_BEGIN)[0]
        post = content.split(MARK_END)[1]
        content = pre + block + post
    else:
        content = content.rstrip() + "\n\n## Measured weak-scaling curve\n\n" + block + "\n"
    with open(path, "w") as fh:
        fh.write(content)


def main() -> None:
    scales = [
        int(s) for s in os.environ.get("WS_SCALES", "1,3,10").split(",")
    ]
    runs = int(os.environ.get("WS_RUNS", "3"))
    sel = os.environ.get("WS_QUERIES")
    names = sel.split(",") if sel else list(DEFAULT_QUERIES)
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    dirs = {s: data_dir(s, base_dir) for s in scales}
    spark = get_spark(
        app_name="weak-scaling",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same one-time warmups as bench.py (Python workers, codegen, JIT)
    try:
        warm = spark.range(64).repartition(32)
        warm.mapInPandas(lambda it: it, warm.schema).write.format(
            "noop"
        ).mode("overwrite").save()
        QUERIES["union_report"].build(spark, dirs[scales[0]]).collect()
    except Exception as e:  # noqa: BLE001
        print(f"warmup failed (continuing): {e}", file=sys.stderr)

    timings: dict[int, dict[str, float]] = {}
    for s in scales:
        t0 = time.perf_counter()
        timings[s] = time_queries(spark, names, dirs[s], runs)
        print(
            f"scale {s}x done in {time.perf_counter() - t0:.0f}s "
            f"({len(timings[s])} queries)",
            file=sys.stderr,
        )
    spark.stop()

    # EVERY run MERGES into the existing results (subset runs used to
    # merge while full runs replaced — a full 1x/3x/10x refresh then
    # clobbered the committed 30x/100x columns once; never again):
    # fresh numbers win per (scale, query), prior-only scales survive.
    out = os.environ.get(
        "WS_OUT", os.path.join(REPO, "SCALE_RESULTS.json")
    )
    if os.path.exists(out):
        try:
            with open(out) as fh:
                prior = json.load(fh)
            # per-scale union merge: prior timings survive for every
            # scale; fresh numbers win where re-measured. A subset run
            # may also ADD a scale column (e.g. a 30x point for the
            # slowest queries) — the published table keeps prior scales
            # and renders missing (query, scale) cells as "—".
            prior_t = {
                int(k): dict(v)
                for k, v in prior.get("timings", {}).items()
            }
            for sc, tmap in prior_t.items():
                merged = dict(tmap)
                merged.update(timings.get(sc, {}))
                timings[sc] = merged
            scales = sorted(set(scales) | set(prior_t))
        except Exception as e:  # noqa: BLE001
            print(f"merge with prior results failed: {e}", file=sys.stderr)

    result = {
        "scales": scales,
        "runs": runs,
        "timings": timings,
        "ratios": {
            s: {
                n: round(timings[s][n] / timings[scales[0]][n], 2)
                for n in timings[s]
                if n in timings[scales[0]] and timings[scales[0]][n] > 0
            }
            for s in scales[1:]
        },
    }
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    # WS_UPDATE_MD=0 keeps SCALE.md's curated table (e.g. a breadth
    # sweep that reports elsewhere)
    if os.environ.get("WS_UPDATE_MD", "1") != "0":
        update_scale_md(render_markdown(scales, timings, runs))
    print(json.dumps({k: result["ratios"].get(k) for k in result["ratios"]}))
    print(f"wrote {out} and updated SCALE.md")


if __name__ == "__main__":
    main()
