"""SparkSession factory.

Centralizes the settings every entry point needs:
  - AQE on (runtime coalescing, broadcast decisions, skew-join splitting) —
    at 100 TB this is what keeps shuffle partition counts sane without
    hand-tuning per query.
  - UTC session timezone — ``hour``/``dayofweek``/``date_trunc`` are
    timezone-sensitive (SURVEY.md §7 hard-parts #7).
  - Arrow enabled for the Pandas-UDF operators (similarity/multimodal).
  - shuffle partitions default sized for local[32] testing; on a real
    cluster AQE coalesces from a deliberately high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbt_datbricks_demo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # InferFiltersFromGenerate turns explode(expensive_array_expr)
        # into a size(...)>0 filter that predicate-pushdown then clones
        # BELOW the repartition exchange — the whole array expression
        # (minhash shingles, n-grams) re-executes on the narrow pre-
        # shuffle side, single-threaded, before the real computation
        # runs again post-shuffle. For this engine staged expensive
        # arrays are the norm, so the rule is globally excluded.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ContextCleaner reclaims shuffle files / broadcast blocks / RDD
        # metadata only when driver GC collects their weak references; in
        # a large, rarely-collected heap the cleanup debt accumulates
        # across a many-query session. The default periodic-GC interval
        # (30min) is longer than a whole session here.
        .config("spark.cleaner.periodicGC.interval", "1min")
        # local[N] runs every executor thread inside this one JVM heap — size
        # it for N concurrent tasks, not for a lone driver (GC stalls at 8g)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # the default 100-entry generated-class cache thrashes on a
        # 100+-query session (every query re-pays Janino compile on its
        # second run); static conf, so it must be set before the JVM
        # starts. Memory cost is bounded: classes, not data.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
