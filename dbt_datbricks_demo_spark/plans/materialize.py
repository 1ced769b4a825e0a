"""Materialization strategies (reference operators S4-S6).

view        — no storage: register a temp view over the lazy DataFrame
              (reference dbt_project.yml:31 — bronze models are views).
table       — full refresh: write parquet, re-read (reference gold marts).
incremental — first run = CTAS; later runs = keyed upsert of rows newer
              than the target's high-water mark (reference
              int_*.sql config blocks + MERGE shape documented at
              databricks_data_flow.sql:193-203).

Delta Lake note: the reference's MERGE runs on Delta. delta-spark is not
available in this environment, so the upsert is expressed as
anti-join + unionByName + atomic directory swap over parquet — the same
row-level semantics as ``whenMatchedUpdateAll().whenNotMatchedInsertAll()``.
When delta-spark IS importable we use a native DeltaTable.merge instead
(one shuffle, no rewrite of untouched files at 100 TB — see _HAVE_DELTA
path). Schema evolution (`on_schema_change='append_new_columns'`) is
handled in both paths by unioning with missing columns added as nulls.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # delta-spark is optional in this environment
    from delta.tables import DeltaTable  # type: ignore

    _HAVE_DELTA = True
except ImportError:
    _HAVE_DELTA = False


def _align_columns(new: DataFrame, existing_cols: list[str]) -> DataFrame:
    """append_new_columns semantics: target keeps its columns and gains any
    new ones (nulls for old rows handled by unionByName allowMissing)."""
    return new


class Materializer:
    """Writes/reads relations under ``warehouse_dir`` with medallion
    schema routing ``<target>_<suffix>.<name>`` (reference
    macros/generate_schema_name.sql:9-23)."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        target: str = "iot_dev",
        table_format: str = "parquet",
    ):
        if table_format not in ("parquet", "delta"):
            raise ValueError(f"unsupported table_format {table_format!r}")
        if table_format == "delta" and not _HAVE_DELTA:
            raise RuntimeError(
                "table_format='delta' requires delta-spark, which is not "
                "importable here — run on a Delta-enabled cluster or "
                "install delta-spark (see tests/test_delta_path.py for "
                "the test matrix)"
            )
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.target = target
        self.table_format = table_format
        os.makedirs(warehouse_dir, exist_ok=True)

    # ---- paths / existence -------------------------------------------------
    def path(self, name: str, schema_suffix: str) -> str:
        return os.path.join(self.warehouse_dir, f"{self.target}_{schema_suffix}", name)

    def exists(self, name: str, schema_suffix: str) -> bool:
        p = self.path(name, schema_suffix)
        return os.path.isdir(p) and bool(
            [
                f
                for f in os.listdir(p)
                if f.endswith(".parquet") or f in ("_SUCCESS", "_delta_log")
            ]
        )

    def read(self, name: str, schema_suffix: str) -> DataFrame:
        return (
            self.spark.read.format(self.table_format)
            .load(self.path(name, schema_suffix))
        )

    # ---- strategies --------------------------------------------------------
    def as_view(self, name: str, df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(name)
        return df

    def as_table(self, name: str, schema_suffix: str, df: DataFrame) -> DataFrame:
        self._atomic_write(df, self.path(name, schema_suffix))
        out = self.read(name, schema_suffix)
        out.createOrReplaceTempView(name)
        return out

    def high_water(self, name: str, schema_suffix: str, col: str):
        """max(watermark_col) of the existing target — collected driver-side
        and pushed back as a literal so the scan of new data gets min/max
        file skipping (SURVEY.md §4)."""
        return self.read(name, schema_suffix).agg(F.max(col).alias("m")).first()["m"]

    def as_partitioned_table(
        self,
        name: str,
        schema_suffix: str,
        df: DataFrame,
        partition_by: list[str],
    ) -> DataFrame:
        """Table materialization with hive-style partition layout
        (dbt-databricks ``partition_by`` config). At 100 TB this is what
        makes downstream predicate-on-partition-key queries prune files
        instead of scanning the world: the read path gets
        PartitionFilters, asserted in tests/test_materialize_strategies.
        """
        path = self.path(name, schema_suffix)
        tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        out = self.read(name, schema_suffix)
        out.createOrReplaceTempView(name)
        return out

    def insert_overwrite(
        self,
        name: str,
        schema_suffix: str,
        new_rows: DataFrame,
        partition_by: str,
    ) -> DataFrame:
        """Incremental strategy ``insert_overwrite`` (dbt-databricks):
        atomically replace exactly the partitions present in
        ``new_rows``; untouched partitions are never read or rewritten.
        This is the canonical 100-TB incremental pattern for
        append-mostly, late-arriving data keyed by a date/hour column —
        no row-level MERGE shuffle, and reprocessing a day is
        idempotent. Equivalent to Spark's dynamic partitionOverwriteMode
        on a partitioned table; implemented here as a per-partition
        directory swap so it works on plain parquet."""
        path = self.path(name, schema_suffix)
        if not self.exists(name, schema_suffix):
            return self.as_partitioned_table(
                name, schema_suffix, new_rows, [partition_by]
            )
        tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
        new_rows.write.mode("overwrite").partitionBy(partition_by).parquet(tmp)
        # Swap the partition directories Spark ACTUALLY wrote. Formatting
        # collected values as f"{col}={val}" does not survive hive
        # escaping (':' → %3A, NULL → __HIVE_DEFAULT_PARTITION__) and a
        # mismatch would silently drop the new partition while stale
        # target data lives on.
        swapped = 0
        for part_dir in os.listdir(tmp):
            if not part_dir.startswith(f"{partition_by}="):
                continue
            src, dst = os.path.join(tmp, part_dir), os.path.join(path, part_dir)
            if not os.path.isdir(src):
                continue
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.replace(src, dst)
            swapped += 1
        shutil.rmtree(tmp, ignore_errors=True)
        if swapped == 0 and new_rows.limit(1).count() > 0:
            raise RuntimeError(
                f"insert_overwrite: no '{partition_by}=' partition dirs "
                f"found in staged write for non-empty increment ({name})"
            )
        out = self.read(name, schema_suffix)
        out.createOrReplaceTempView(name)
        return out

    def append(
        self, name: str, schema_suffix: str, new_rows: DataFrame
    ) -> DataFrame:
        """Incremental strategy ``append`` (dbt-databricks): write new
        files into the existing table directory without reading or
        rewriting any existing data — the cheapest possible increment
        for insert-only event streams (no keys, no partitions)."""
        path = self.path(name, schema_suffix)
        if not self.exists(name, schema_suffix):
            return self.as_table(name, schema_suffix, new_rows)
        new_rows.write.mode("append").parquet(path)
        out = self.read(name, schema_suffix)
        out.createOrReplaceTempView(name)
        return out

    def merge_upsert(
        self, name: str, schema_suffix: str, new_rows: DataFrame, unique_key: str
    ) -> DataFrame:
        """Keyed upsert: rows in `new_rows` replace same-key target rows,
        others append (MERGE whenMatchedUpdateAll/whenNotMatchedInsertAll).

        Delta targets use the native transactional MERGE — file-level
        rewrite of only the touched files, which is the whole point at
        100 TB. Parquet targets emulate the row-level semantics with
        anti-join + unionByName + atomic swap (full rewrite)."""
        path = self.path(name, schema_suffix)
        if self.table_format == "delta":
            return self._merge_upsert_delta(path, name, new_rows, unique_key)
        target = self.spark.read.parquet(path)
        kept = target.join(
            new_rows.select(unique_key).distinct(), on=unique_key, how="left_anti"
        )
        merged = kept.unionByName(new_rows, allowMissingColumns=True)
        self._atomic_write(merged, path)
        out = self.read(name, schema_suffix)
        out.createOrReplaceTempView(name)
        return out

    def _merge_upsert_delta(
        self, path: str, name: str, new_rows: DataFrame, unique_key: str
    ) -> DataFrame:
        """Native Delta MERGE (reference MERGE shape,
        databricks_data_flow.sql:193-203). autoMerge carries the
        append_new_columns schema-evolution contract the parquet path
        implements via unionByName(allowMissingColumns)."""
        self.spark.conf.set(
            "spark.databricks.delta.schema.autoMerge.enabled", "true"
        )
        (
            DeltaTable.forPath(self.spark, path)
            .alias("t")
            .merge(new_rows.alias("s"), f"t.{unique_key} = s.{unique_key}")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        out = self.spark.read.format("delta").load(path)
        out.createOrReplaceTempView(name)
        return out

    # ---- internals ---------------------------------------------------------
    def _atomic_write(self, df: DataFrame, path: str) -> None:
        """Write to a temp dir then swap — readers never see a half-written
        table, and self-referencing plans (merge reads the table it
        replaces) are computed before the old data disappears. Delta
        writes are transactional via the log, so they overwrite in
        place instead of directory-swapping."""
        if self.table_format == "delta":
            (
                df.write.format("delta")
                .mode("overwrite")
                .option("overwriteSchema", "true")
                .save(path)
            )
            return
        tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
