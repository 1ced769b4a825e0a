"""Shared helpers for model builders."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.config import RunConfig


def now_col(cfg: RunConfig) -> Column:
    """Audit timestamp: current_timestamp(), or a frozen literal for
    deterministic golden tests (SURVEY.md §7 hard-parts #5)."""
    if cfg.frozen_now is not None:
        return F.lit(cfg.frozen_now).cast("timestamp")
    return F.current_timestamp()


def today_col(cfg: RunConfig) -> Column:
    if cfg.frozen_now is not None:
        return F.lit(cfg.frozen_now.date()).cast("date")
    return F.current_date()
