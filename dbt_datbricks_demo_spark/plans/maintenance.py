"""Table maintenance operators (reference S9: OPTIMIZE / ZORDER / VACUUM /
DESCRIBE HISTORY / DESCRIBE DETAIL / RESTORE / time travel —
databricks_data_flow.sql:23,49-55,99,109,255-268,279).

The reference runs these as Delta SQL on Databricks. delta-spark is not
in this container, so this module provides the same operator surface on
a versioned parquet layout:

    <root>/<table>/_v<N>/part-*.parquet    one immutable snapshot per write
    <root>/<table>/_history.json           append-only commit manifest

Semantics map 1:1:
    write()/overwrite        → new snapshot version (Delta commit)
    read(version=...)        → SELECT ... VERSION AS OF
    history()                → DESCRIBE HISTORY
    detail()                 → DESCRIBE DETAIL
    restore(version)         → RESTORE TABLE ... TO VERSION AS OF
    optimize(...)            → OPTIMIZE (small-file compaction)
    optimize(zorder_by=[..]) → OPTIMIZE ... ZORDER BY (range-cluster the
                               rows by the given columns so each file
                               covers a narrow key range → min/max file
                               skipping, the effect Z-ordering exists for)
    vacuum(retain_last=N)    → VACUUM (drop unreferenced snapshots)
    analyze()                → ANALYZE TABLE ... COMPUTE STATISTICS

Scale notes: full-snapshot versioning is the right call for the demo
warehouse (tables are MBs); at 100 TB you'd swap this for Delta/Iceberg
whose transaction logs track files incrementally — the API here is
deliberately shaped so that swap is a storage-layer change, not a
caller change. Compaction targets ~128 MB files via bytes/partition
estimation rather than a fixed partition count.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _num_parquet_files(path: str) -> int:
    return sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


class VersionedTable:
    """A parquet table with commit history, time travel, compaction and
    retention — the S9 maintenance surface without a Delta dependency."""

    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.dir = os.path.join(root, name)
        self.name = name
        os.makedirs(self.dir, exist_ok=True)

    # ---- commit log --------------------------------------------------------
    @property
    def _history_path(self) -> str:
        return os.path.join(self.dir, "_history.json")

    def _commits(self) -> list[dict]:
        if not os.path.exists(self._history_path):
            return []
        with open(self._history_path) as f:
            return json.load(f)

    def _append_commit(self, entry: dict) -> None:
        commits = self._commits()
        commits.append(entry)
        tmp = self._history_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(commits, f, indent=1)
        os.replace(tmp, self._history_path)

    def current_version(self) -> int | None:
        commits = [c for c in self._commits() if not c.get("removed")]
        return commits[-1]["version"] if commits else None

    def _vpath(self, version: int) -> str:
        return os.path.join(self.dir, f"_v{version}")

    # ---- write / read / time travel ---------------------------------------
    def write(self, df: DataFrame, operation: str = "WRITE", **op_params) -> int:
        commits = self._commits()
        # next id from FULL history (not just live versions): a table
        # vacuumed down to zero live versions must not reuse version ids
        version = max(c["version"] for c in commits) + 1 if commits else 0
        path = self._vpath(version)
        df.write.mode("overwrite").parquet(path)
        rows = self.spark.read.parquet(path).count()
        self._append_commit(
            {
                "version": version,
                "timestamp": time.time(),
                "operation": operation,
                "operationParameters": op_params,
                "numFiles": _num_parquet_files(path),
                "sizeBytes": _dir_bytes(path),
                "numRows": rows,
            }
        )
        return version

    def read(self, version: int | None = None) -> DataFrame:
        """Latest snapshot, or `VERSION AS OF version` time travel."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"{self.name}: no committed version")
        path = self._vpath(v)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"{self.name}: version {v} vacuumed or never written"
            )
        return self.spark.read.parquet(path)

    def restore(self, version: int) -> int:
        """RESTORE: re-commit an old snapshot as the new current version."""
        return self.write(self.read(version), "RESTORE", restored_version=version)

    # ---- history / detail / stats ------------------------------------------
    def history(self) -> DataFrame:
        """DESCRIBE HISTORY analog: one row per commit, newest first."""
        commits = self._commits()
        if not commits:
            return self.spark.createDataFrame(
                [],
                "version long, timestamp double, operation string, "
                "numFiles long, sizeBytes long, numRows long, removed boolean",
            )
        rows = [
            (
                c["version"], c["timestamp"], c["operation"],
                c["numFiles"], c["sizeBytes"], c["numRows"],
                bool(c.get("removed", False)),
            )
            for c in commits
        ]
        return self.spark.createDataFrame(
            rows,
            "version long, timestamp double, operation string, "
            "numFiles long, sizeBytes long, numRows long, removed boolean",
        ).orderBy(F.col("version").desc())

    def detail(self) -> dict:
        """DESCRIBE DETAIL analog for the current snapshot."""
        v = self.current_version()
        path = self._vpath(v)
        return {
            "name": self.name,
            "location": path,
            "version": v,
            "numFiles": _num_parquet_files(path),
            "sizeInBytes": _dir_bytes(path),
        }

    def analyze(self) -> dict:
        """ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS analog:
        row count + per-column null counts and min/max, stored on the
        latest commit (what a CBO would read)."""
        df = self.read()
        aggs: list = [F.count(F.lit(1)).alias("__rows")]
        for c in df.columns:
            aggs.append(F.min(c).alias(f"min__{c}"))
            aggs.append(F.max(c).alias(f"max__{c}"))
            aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls__{c}"))
        row = df.agg(*aggs).first().asDict()
        stats = {
            "numRows": row.pop("__rows"),
            "columns": {
                c: {
                    "min": row[f"min__{c}"],
                    "max": row[f"max__{c}"],
                    "nullCount": row[f"nulls__{c}"],
                }
                for c in df.columns
            },
        }
        commits = self._commits()
        commits[-1]["stats"] = json.loads(json.dumps(stats, default=str))
        tmp = self._history_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(commits, f, indent=1)
        os.replace(tmp, self._history_path)
        return stats

    # ---- optimize / vacuum -------------------------------------------------
    def optimize(
        self,
        zorder_by: list[str] | None = None,
        target_file_bytes: int = TARGET_FILE_BYTES,
    ) -> int:
        """OPTIMIZE [ZORDER BY]: rewrite the current snapshot into
        ~target-sized files; with zorder_by, range-cluster rows on those
        columns first so each output file covers a narrow key range
        (parquet min/max footers then skip files on key predicates)."""
        v = self.current_version()
        df = self.read(v)
        size = _dir_bytes(self._vpath(v))
        n_files = max(1, math.ceil(size / target_file_bytes))
        if zorder_by:
            df = df.repartitionByRange(n_files, *[F.col(c) for c in zorder_by])
            df = df.sortWithinPartitions(*zorder_by)
        else:
            df = df.coalesce(n_files)
        return self.write(
            df, "OPTIMIZE", zorder_by=zorder_by or [], targetBytes=target_file_bytes
        )

    def vacuum(self, retain_last: int = 1, dry_run: bool = False) -> list[int]:
        """VACUUM: drop snapshot dirs older than the last `retain_last`
        live versions (history rows stay, marked removed — matching
        Delta, where history survives vacuum but the data doesn't)."""
        commits = self._commits()
        live = [c for c in commits if not c.get("removed")]
        victims = [c["version"] for c in live[:-retain_last]] if retain_last else [
            c["version"] for c in live
        ]
        if dry_run:
            return victims
        for c in commits:
            if c["version"] in victims:
                shutil.rmtree(self._vpath(c["version"]), ignore_errors=True)
                c["removed"] = True
        tmp = self._history_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(commits, f, indent=1)
        os.replace(tmp, self._history_path)
        return victims
