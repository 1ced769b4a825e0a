"""Scalar helper functions (the engine's "macro" layer).

The reference's only non-builtin scalar is dbt_utils.generate_surrogate_key
(pinned dbt_utils 1.3.3; reference: package-lock.yml:1-4), which compiles to
``md5(concat_ws('-', coalesce(cast(col as string), '_dbt_utils_surrogate_key_null_'), ...))``.
We reproduce it byte-for-byte (SURVEY.md §2.9 "Hash / surrogate key") so keys
compare equal across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_SENTINEL = "_dbt_utils_surrogate_key_null_"


def surrogate_key(*cols: Column | str) -> Column:
    """dbt_utils.generate_surrogate_key-compatible md5 key.

    Accepts column names or Column expressions (the reference passes the
    expression ``date_trunc('hour', reading_ts)`` at int_device_health.sql:29).
    Timestamps stringify as ``yyyy-MM-dd HH:mm:ss`` under a UTC session —
    identical to the warehouse's cast-to-string, so keys match byte-for-byte.
    """
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit(NULL_SENTINEL),
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def surrogate_key_sql(*exprs: str) -> str:
    """The same key as an ANSI-SQL fragment (for oracle parity checks)."""
    parts = ", ".join(
        f"coalesce(cast({e} as varchar), '{NULL_SENTINEL}')" for e in exprs
    )
    return f"md5(concat_ws('-', {parts}))"


def safe_divide(num: Column, den: Column) -> Column:
    """x / nullif(y, 0) — the reference's div-by-zero guard
    (int_device_health.sql:51, fct_device_summary.sql:44,49)."""
    return num / F.nullif(den, F.lit(0))
