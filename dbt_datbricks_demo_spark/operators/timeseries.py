"""Time-series gap filling and interpolation (hypertable-style).

Time-series stores (TimescaleDB ``time_bucket_gapfill`` +
``locf``/``interpolate``) emit one row per (key, bucket) even where no
data arrived, with missing values forward-filled or linearly
interpolated. Spark-native construction (single-pass form, round 12):

  1. prev-known / next-known lookups as running-frame windows over the
     OBSERVED rows only (one shuffle on key, |observed|-sized sorts);
  2. each observed row then GENERATES its own gap run in-plan —
     ``explode(sequence(bucket, next_bucket − step))`` — whose union is
     exactly the per-key min→max bucket spine; gap rows inherit their
     anchor's carried prev/next values. No spine join, one scan.

Input contract: observed buckets must lie ON the step grid (they come
from a ``time_bucket``/``date_trunc`` upstream) and be UNIQUE per
(key, bucket) — pre-aggregate duplicates (e.g. avg per bucket) first.
Off-grid buckets silently shift the generated spine; duplicate rows
each emit their own single-bucket run (the sequence end is clamped to
the anchor, so duplicates degrade to duplicated output rows, not a
runtime 'Illegal sequence boundaries' error).

Scale: the generated spine is |keys| x |buckets in range| rows of tiny
columns — spill-friendly; the windows run per key only, with running
frames bounded by run length, not history. Skewed keys (one device
with years of history) split cleanly because the window is per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucket_spine(
    observed: DataFrame, key: str, bucket: str, step_seconds: int = 3600
) -> DataFrame:
    """One row per (key, bucket) from each key's min to max observed
    bucket, generated in-plan."""
    bounds = observed.groupBy(key).agg(
        F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi")
    )
    return bounds.select(
        key,
        F.explode(
            F.sequence(
                F.col("_lo"),
                F.col("_hi"),
                F.expr(f"interval {step_seconds} seconds"),
            )
        ).alias(bucket),
    )


def gap_fill(
    observed: DataFrame,
    key: str,
    bucket: str,
    value: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """TimescaleDB-style gapfill: returns the full spine with columns
    ``known`` (bool), ``ffill`` (last observation carried forward) and
    ``interp`` (linear interpolation between neighboring observations;
    observed rows keep their value; leading/trailing gaps fall back to
    the nearest known value).

    Single-pass shape (optimization round 12): the previous form built
    the spine from a SECOND aggregation over ``observed`` (min/max
    bounds), left-joined observed back onto it, and ran both window
    lookups over the |spine|-sized joined table — at sf0.1 the plan
    scanned the events table twice with four exchanges and sorted the
    full spine twice. Every value the interpolation needs is already a
    function of the OBSERVED rows alone, so this form computes the
    prev/next-known lookups with windows over observed (same running
    frames — never the O(n²) UnboundedFollowing rescan; DESC running
    frame for "next", measured 28 s vs ~2 s at sf0.1 in round 4), then
    GENERATES each observed row's gap run in-plan: explode of
    sequence(bucket, next_bucket − step). The union of those runs is
    exactly the old spine (observed buckets lie on the step grid: they
    are produced by a time_bucket/date_trunc upstream — the operator's
    documented input contract), gap rows inherit their anchor's
    carried prev/next values (identical to what the old per-spine-row
    running frames computed, since every row between two observations
    is null), and the join disappears: one scan, one exchange, two
    |observed|-sized sorts, then a narrow generate.
    """
    w_lead = Window.partitionBy(key).orderBy(bucket)
    w_prev = (
        Window.partitionBy(key)
        .orderBy(bucket)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(key)
        .orderBy(F.col(bucket).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    v = F.col(value)
    t = F.unix_timestamp(bucket)
    known_t = F.when(v.isNotNull(), t)
    step = F.expr(f"interval {step_seconds} seconds")

    anchors = observed.select(
        key,
        F.col(bucket).alias("_b0"),
        v.alias("_v0"),
        # prev-known at the anchor, frame (-inf, 0] — includes itself;
        # every generated gap row strictly before the next observation
        # sees the same prev-known as its anchor
        F.last(v, ignorenulls=True).over(w_prev).alias("_v_prev"),
        F.last(known_t, ignorenulls=True).over(w_prev).alias("_t_prev"),
        # next-known strictly after the anchor (DESC running frame);
        # gap rows lie before the next observation, so they share it
        F.last(v, ignorenulls=True).over(w_next).alias("_v_next"),
        F.last(known_t, ignorenulls=True).over(w_next).alias("_t_next"),
        F.lead(bucket).over(w_lead).alias("_b_next"),
    )
    # each anchor owns the half-open run [bucket, next_bucket); the last
    # anchor of a key owns just itself — reproducing sequence(lo, hi)
    spine = anchors.select(
        key,
        "_b0",
        "_v0",
        "_v_prev",
        "_t_prev",
        "_v_next",
        "_t_next",
        F.explode(
            F.sequence(
                F.col("_b0"),
                # greatest(): a duplicate (key, bucket) input row makes
                # _b_next == _b0, and an unclamped end of _b0 − step
                # would throw 'Illegal sequence boundaries' at runtime;
                # clamped, each duplicate anchor emits its own
                # single-bucket run. On contract-valid input (unique
                # grid buckets) _b_next − step >= _b0 and the clamp is
                # an identity.
                F.greatest(
                    F.coalesce(F.col("_b_next") - step, F.col("_b0")),
                    F.col("_b0"),
                ),
                step,
            )
        ).alias(bucket),
    )
    on_anchor = F.col(bucket) == F.col("_b0")
    sv = F.when(on_anchor, F.col("_v0"))  # spine-row value (null in gaps)
    st = F.unix_timestamp(bucket)
    v_prev, t_prev = F.col("_v_prev"), F.col("_t_prev")
    v_next, t_next = F.col("_v_next"), F.col("_t_next")

    frac: Column = (st - t_prev) / (t_next - t_prev)
    interp = (
        F.when(sv.isNotNull(), sv.cast("double"))
        .when(
            v_prev.isNotNull() & v_next.isNotNull(),
            v_prev + (v_next - v_prev) * frac,
        )
        .when(v_prev.isNotNull(), v_prev.cast("double"))
        .otherwise(v_next.cast("double"))
    )
    return spine.select(
        key,
        bucket,
        sv.isNotNull().alias("known"),
        v_prev.cast("double").alias("ffill"),
        F.round(interp, 6).alias("interp"),
    )
