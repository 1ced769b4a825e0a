"""Benchmark runner: executes the operator-inventory queries at a scale
factor and prints ONE JSON line for the driver.

  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default *)
  BENCH_QUERIES        comma-separated subset (default: all)

Each query is forced end-to-end with a noop-format write (full compute,
no driver-side result materialization cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_datbricks_demo_spark.queries import QUERIES  # noqa: E402
from dbt_datbricks_demo_spark.session import get_spark  # noqa: E402


def _unpersist_all(spark) -> None:
    """Drop cached/localCheckpointed blocks left behind by a finished
    query. The size-guarded operators eagerly localCheckpoint small
    relations (candidate pairs, signature tables); across 52 queries × 2
    runs those blocks pile up in the block manager and the later
    queries' timings degrade from memory pressure. Each query's blocks
    are dead once its noop write returns — freeing them keeps runs
    independent."""
    it = (
        spark.sparkContext._jsc.sc().getPersistentRDDs().values().iterator()
    )
    while it.hasNext():
        it.next().unpersist(False)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # no console progress bars: the driver records the merged output tail,
    # which should end with the JSON line, not stage-bar control chars
    spark = get_spark(
        app_name="bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    selected = os.environ.get("BENCH_QUERIES")
    names = selected.split(",") if selected else list(QUERIES)

    # warmup: JVM + parquet footer caches, tiny action
    QUERIES["union_report"].build(spark, sf_dir).collect()
    # warmup: Python worker daemons + Arrow codepath (first mapInPandas in
    # a fresh JVM costs ~20 s of one-time fork/import across the workers)
    warm = spark.range(64).repartition(32)
    warm.mapInPandas(lambda it: it, warm.schema).write.format("noop").mode(
        "overwrite"
    ).save()

    # best-of-2 per query: one JVM sees every query once before any
    # second run, so codegen/JIT warmup and stray GC pauses don't land in
    # the reported steady-state number
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for _ in range(runs):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            elapsed = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, elapsed), elapsed)
            _unpersist_all(spark)

    # orderly shutdown BEFORE the result line: an exiting JVM with
    # in-flight task-completion events logs spurious DAGScheduler
    # errors into stderr (seen in round 1's recorded tail)
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "operator-inventory wall time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
