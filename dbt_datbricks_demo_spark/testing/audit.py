"""Relation auditing (dbt-audit-helper parity): diff two relations.

The migration workflow the reference ecosystem uses when porting a
model (``compare_relations`` in dbt-audit-helper): given old and new
versions of a table and a primary key, report added / removed /
changed / identical row counts plus which columns drifted. One
full-outer join on the key — co-partitioned, no row data collected;
the per-column drift report aggregates booleans, so the shuffle
carries keys + a bitmask, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_relations(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One-row summary: n_old, n_new, n_added, n_removed, n_changed,
    n_identical, and per-column changed counts (as a map)."""
    cols = compare_cols or [c for c in old.columns if c != key and c in new.columns]
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")

    in_old = F.col(f"o.{key}").isNotNull()
    in_new = F.col(f"n.{key}").isNotNull()
    col_changed = {
        c: in_old & in_new & ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        for c in cols
    }
    any_changed = F.lit(False)
    for expr in col_changed.values():
        any_changed = any_changed | expr

    aggs = [
        F.count_if(in_old).alias("n_old"),
        F.count_if(in_new).alias("n_new"),
        F.count_if(in_new & ~in_old).alias("n_added"),
        F.count_if(in_old & ~in_new).alias("n_removed"),
        F.count_if(any_changed).alias("n_changed"),
        F.count_if(in_old & in_new & ~any_changed).alias("n_identical"),
    ]
    aggs += [
        F.count_if(expr).alias(f"changed_{c}") for c, expr in col_changed.items()
    ]
    return joined.agg(*aggs)


def changed_rows(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """The drilldown: (key, column, old_value, new_value) for every
    changed cell — what you look at after compare_relations says
    n_changed > 0. Values stringified so heterogeneous columns stack."""
    cols = compare_cols or [c for c in old.columns if c != key and c in new.columns]
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "inner")
    per_col = [
        joined.filter(~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))).select(
            F.col(f"o.{key}").alias(key),
            F.lit(c).alias("column"),
            F.col(f"o.{c}").cast("string").alias("old_value"),
            F.col(f"n.{c}").cast("string").alias("new_value"),
        )
        for c in cols
    ]
    out = per_col[0]
    for df in per_col[1:]:
        out = out.unionByName(df)
    return out
