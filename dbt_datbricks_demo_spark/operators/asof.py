"""As-of (backward) join — an operator the reference lacks and Spark has
no primitive for (SURVEY §2.4 notes interval/as-of joins absent).

For each left row, attach the most recent right row for the same key
with right.time <= left.time. The naive formulation (range join +
row_number) explodes to |L|×|R| pairs per key before pruning; this
implementation is the scalable union-marker pattern:

    1. union left and right rows into one stream, tagged by side;
    2. one shuffle, partitioned by key, sorted by (time, side);
    3. a running `last(right_value, ignorenulls=True)` window carries
       each right row's values forward to every later left row;
    4. keep the left rows.

Cost: ONE hash shuffle of |L|+|R| rows and a per-partition sort — the
same price as a regular join — and the running window is
whole-stage-codegen'd. Right side should be pre-deduplicated to one row
per (key, time) (pass a tie-break aggregation upstream) so the match is
deterministic; ties between a left and right row at the same timestamp
match inclusively (right sorts first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: list[str] | str,
    right_cols: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join (left join semantics: every left row kept).

    right must contain [by..., time_col, right_cols...] and at most one
    row per (by, time_col). right_cols must not collide with left's
    columns — rename upstream. tolerance_seconds optionally voids
    matches older than left.time − tolerance (matched columns become
    null, like pandas.merge_asof's tolerance).
    """
    by = [by] if isinstance(by, str) else list(by)
    left_cols = left.columns

    r = right.select(
        *by,
        F.col(time_col),
        *right_cols,
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in by and c != time_col],
    )
    l = left.select(
        *by,
        F.col(time_col),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left_cols if c not in by and c != time_col],
    )
    unioned = r.unionByName(l)

    # right rows (side 0) sort before left rows at the same timestamp →
    # a left row matches a right row with equal time (inclusive as-of)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col(_SIDE) == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_m_{c}")
            for c in right_cols
        ],
        F.last(F.when(F.col(_SIDE) == 0, F.col(time_col)), ignorenulls=True)
        .over(w)
        .alias("_m_time"),
    )

    out = carried.filter(F.col(_SIDE) == 1)
    in_tol = (
        F.lit(True)
        if tolerance_seconds is None
        else (
            F.col(time_col).cast("double") - F.col("_m_time").cast("double")
            <= F.lit(float(tolerance_seconds))
        )
    )
    return out.select(
        *[F.col(c) for c in left_cols],
        *[
            F.when(in_tol, F.col(f"_m_{c}")).alias(c)
            for c in right_cols
        ],
        F.when(in_tol, F.col("_m_time")).alias(f"matched_{time_col}"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: list[str] | str,
    right_cols: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row for
    the same key with right.time >= left.time (pandas merge_asof
    direction='forward'). Same union-marker shape as the backward join —
    one hash shuffle of |L|+|R| rows, one per-partition sort, a running
    first(..., ignorenulls) window looking forward — so the cost is a
    regular join's, never |L|x|R| pairs. Left rows sort BEFORE right
    rows at equal timestamps, so an exact-time right row matches
    (inclusive forward). tolerance_seconds voids matches further than
    left.time + tolerance.
    """
    by = [by] if isinstance(by, str) else list(by)
    left_cols = left.columns

    r = right.select(
        *by,
        F.col(time_col),
        *right_cols,
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in by and c != time_col],
    )
    l = left.select(
        *by,
        F.col(time_col),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        F.lit(0).alias(_SIDE),
        *[F.col(c) for c in left_cols if c not in by and c != time_col],
    )
    unioned = r.unionByName(l)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col), F.col(_SIDE))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        *[
            F.first(F.when(F.col(_SIDE) == 1, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_m_{c}")
            for c in right_cols
        ],
        F.first(F.when(F.col(_SIDE) == 1, F.col(time_col)), ignorenulls=True)
        .over(w)
        .alias("_m_time"),
    )

    out = carried.filter(F.col(_SIDE) == 0)
    in_tol = (
        F.lit(True)
        if tolerance_seconds is None
        else (
            F.col("_m_time").cast("double") - F.col(time_col).cast("double")
            <= F.lit(float(tolerance_seconds))
        )
    )
    return out.select(
        *[F.col(c) for c in left_cols],
        *[F.when(in_tol, F.col(f"_m_{c}")).alias(c) for c in right_cols],
        F.when(in_tol, F.col("_m_time")).alias(f"matched_{time_col}"),
    )
