"""Source freshness checks (reference operator S7).

The reference declares ``loaded_at_field: ingested_at`` with warn-after 24h /
error-after 48h on the raw sources, a per-table ``loaded_at_field: null``
opt-out for raw_devices, and an ``alert_ts`` override for raw_alerts
(reference: models/staging/sources.yml:3-46). A freshness check is
``max(loaded_at_field)`` age versus those SLAs — one cheap agg per source.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FreshnessResult:
    source: str
    max_loaded_at: _dt.datetime | None
    age_seconds: float | None
    status: str  # 'pass' | 'warn' | 'error' | 'skipped'


def check_freshness(
    df: DataFrame,
    source_name: str,
    loaded_at_field: str | None,
    warn_after_hours: float = 24.0,
    error_after_hours: float = 48.0,
    now: _dt.datetime | None = None,
) -> FreshnessResult:
    if loaded_at_field is None:
        # raw_devices opts out (sources.yml:30-31) — master data has no SLA
        return FreshnessResult(source_name, None, None, "skipped")
    max_ts = df.agg(F.max(loaded_at_field).alias("m")).first()["m"]
    if max_ts is None:
        return FreshnessResult(source_name, None, None, "error")
    # Pin the clock to UTC: Spark hands back naive datetimes in the
    # session timezone (UTC here), so a naive datetime.now() would
    # silently shift the age if the container TZ ever differed.
    now = now or _dt.datetime.now(_dt.timezone.utc)
    if now.tzinfo is not None:
        now = now.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    if max_ts.tzinfo is not None:
        max_ts = max_ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    age = (now - max_ts).total_seconds()
    if age > error_after_hours * 3600:
        status = "error"
    elif age > warn_after_hours * 3600:
        status = "warn"
    else:
        status = "pass"
    return FreshnessResult(source_name, max_ts, age, status)
