"""Generic data-quality tests — each returns a DataFrame of violations.

Shapes match dbt's generated test queries (reference SURVEY.md §5):
  not_null         — rows where col is null
  unique           — values with count > 1 (group-by + having)
  accepted_values  — distinct values outside the allowed set
  relationships    — child keys absent from the parent (anti-join)
  value_in_range   — reference macros/test_value_in_range.sql:10-23
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(df: DataFrame, column: str) -> DataFrame:
    return df.select(column).filter(F.col(column).isNull())


def unique(df: DataFrame, column: str) -> DataFrame:
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(F.col("n_records") > 1)
    )


def accepted_values(df: DataFrame, column: str, values: Sequence) -> DataFrame:
    return (
        df.select(column)
        .filter(F.col(column).isNotNull() & ~F.col(column).isin(list(values)))
        .distinct()
    )


def relationships(child: DataFrame, column: str, parent: DataFrame, field: str) -> DataFrame:
    """Child FK values with no matching parent row. Broadcast anti-join:
    the parent side is a dimension in every reference usage."""
    return (
        child.select(F.col(column))
        .filter(F.col(column).isNotNull())
        .join(
            F.broadcast(parent.select(F.col(field).alias(column)).distinct()),
            on=column,
            how="left_anti",
        )
    )


def value_in_range(
    df: DataFrame, column: str, min_value: float, max_value: float
) -> DataFrame:
    """Custom generic from the reference (defined, never bound — latent
    surface we expose anyway)."""
    c = F.col(column)
    return (
        df.filter(c.isNotNull() & ((c < min_value) | (c > max_value)))
        .groupBy(c.alias("invalid_value"))
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )
