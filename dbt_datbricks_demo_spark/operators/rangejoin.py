"""Keyed range (point-in-interval) join — reference has none (SURVEY
§2.4: interval joins absent); Spark's native plan for a time-inequality
join with no equi-key half is BroadcastNestedLoopJoin, which is O(|L|·|R|)
and falls over long before 100 TB.

The scalable formulation bins time:

    1. intervals replicate to every bin they overlap (explode of a tiny
       sequence — interval_days/bin_width rows each);
    2. points map to their single bin;
    3. equi-join on (key, bin) — a plain hash shuffle;
    4. residual filter lo <= t < hi discards same-bin non-overlaps.

Each true (point, interval) pair meets in exactly one bin (the point's),
so no dedup pass is needed. Bin width trades replication (wide bins →
fewer copies) against join selectivity (narrow bins → fewer false
same-bin candidates); set it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "_range_bin"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_time: str,
    interval_lo: str,
    interval_hi: str,
    bin_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Inner join of each point row to interval rows of the same key with
    lo <= t < hi. Keys + both frames' other columns are preserved
    (disambiguate colliding names upstream). Inner-only by design: an
    outer variant through the residual filter would silently drop
    unmatched rows — left semantics need a post-join anti-union, not a
    filter."""
    keys = [on] if isinstance(on, str) else list(on)
    bw = F.lit(bin_seconds)

    p = points.withColumn(
        _BIN, F.floor(F.unix_timestamp(F.col(point_time)) / bw)
    )
    lo_bin = F.floor(F.unix_timestamp(F.col(interval_lo)) / bw)
    # hi is exclusive: the last covered instant is hi − 1s
    hi_bin = F.floor((F.unix_timestamp(F.col(interval_hi)) - 1) / bw)
    i = intervals.withColumn(
        _BIN, F.explode(F.sequence(lo_bin, hi_bin))
    )
    joined = p.join(i, on=keys + [_BIN], how="inner")
    return joined.filter(
        (F.col(point_time) >= F.col(interval_lo))
        & (F.col(point_time) < F.col(interval_hi))
    ).drop(_BIN)
