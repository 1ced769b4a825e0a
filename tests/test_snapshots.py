"""dbt snapshot (SCD2) semantics: plans/snapshots.py.

The oracle-checked scd2_snapshot query covers the timestamp strategy's
two-batch replay end-to-end; these tests pin the branch semantics dbt
documents for each strategy — check-cols change detection (null-safe),
hard-delete handling, idempotent re-application, and config validation.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.plans import snapshots
from dbt_datbricks_demo_spark.plans.snapshots import SnapshotConfig, snapshot_apply

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)
T1 = dt.datetime(2025, 1, 2, 0, 0, 0)
T2 = dt.datetime(2025, 1, 3, 0, 0, 0)

TS_CFG = SnapshotConfig(unique_key="id", strategy="timestamp", updated_at="u")
CHECK_CFG = SnapshotConfig(unique_key="id", strategy="check", check_cols=("v",))


def _rows(df, *cols):
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple((v is None, str(v)) for v in t))


def _src(spark, rows):
    return spark.createDataFrame(rows, "id int, v string, u timestamp")


def test_first_apply_all_open(spark):
    src = _src(spark, [(1, "a", T0), (2, "b", T0)])
    snap = snapshot_apply(None, src, TS_CFG)
    assert snap.filter(F.col("dbt_valid_to").isNotNull()).count() == 0
    got = _rows(snap, "id", "v", "dbt_valid_from")
    assert got == [(1, "a", T0), (2, "b", T0)]
    # scd_id is the dbt_utils surrogate key of (key, updated_at)
    sid = snap.filter("id = 1").select("dbt_scd_id").first()[0]
    expect = spark.sql(
        f"select md5(concat_ws('-', '1', cast(timestamp'{T0}' as string)))"
    ).first()[0]
    assert sid == expect


def test_timestamp_strategy_reapply_is_idempotent(spark):
    src = _src(spark, [(1, "a", T0), (2, "b", T0)])
    once = snapshot_apply(None, src, TS_CFG)
    twice = snapshot_apply(once, src, TS_CFG)
    assert _rows(twice, "id", "v", "dbt_valid_from", "dbt_valid_to") == _rows(
        once, "id", "v", "dbt_valid_from", "dbt_valid_to"
    )


def test_timestamp_strategy_advance_closes_and_inserts(spark):
    snap = snapshot_apply(None, _src(spark, [(1, "a", T0), (2, "b", T0)]), TS_CFG)
    # key 1 advances, key 2 regresses (stale replay — must be ignored),
    # key 3 is new
    batch = _src(spark, [(1, "a2", T1), (2, "stale", dt.datetime(2024, 1, 1)), (3, "c", T1)])
    out = snapshot_apply(snap, batch, TS_CFG)
    got = _rows(out, "id", "v", "dbt_valid_from", "dbt_valid_to")
    assert got == [
        (1, "a", T0, T1),
        (1, "a2", T1, None),
        (2, "b", T0, None),
        (3, "c", T1, None),
    ]


def test_check_strategy_nullsafe_change_detection(spark):
    src = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "x")], "id int, v string"
    )
    snap = snapshot_apply(None, src, CHECK_CFG, batch_ts=T0)
    # 1 unchanged, 2 NULL→'b' (a change), 3 'x'→NULL (a change)
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id int, v string"
    )
    out = snapshot_apply(snap, batch, CHECK_CFG, batch_ts=T1)
    got = _rows(out, "id", "v", "dbt_valid_from", "dbt_valid_to")
    assert got == [
        (1, "a", T0, None),
        (2, "b", T1, None),
        (2, None, T0, T1),
        (3, "x", T0, T1),
        (3, None, T1, None),
    ]


def test_hard_deletes_default_keep_open(spark):
    snap = snapshot_apply(None, _src(spark, [(1, "a", T0), (2, "b", T0)]), TS_CFG)
    out = snapshot_apply(snap, _src(spark, [(1, "a", T0)]), TS_CFG, batch_ts=T1)
    assert _rows(out, "id", "dbt_valid_to") == [(1, None), (2, None)]


def test_hard_deletes_invalidate_closes_at_batch_ts(spark):
    cfg = SnapshotConfig(
        unique_key="id",
        strategy="timestamp",
        updated_at="u",
        invalidate_hard_deletes=True,
    )
    snap = snapshot_apply(None, _src(spark, [(1, "a", T0), (2, "b", T0)]), cfg)
    out = snapshot_apply(snap, _src(spark, [(1, "a", T0)]), cfg, batch_ts=T1)
    assert _rows(out, "id", "dbt_valid_to") == [(1, None), (2, T1)]


def test_closed_history_passes_through(spark):
    snap = snapshot_apply(None, _src(spark, [(1, "a", T0)]), TS_CFG)
    snap = snapshot_apply(snap, _src(spark, [(1, "a2", T1)]), TS_CFG)
    out = snapshot_apply(snap, _src(spark, [(1, "a3", T2)]), TS_CFG)
    got = _rows(out, "id", "v", "dbt_valid_from", "dbt_valid_to")
    assert got == [
        (1, "a", T0, T1),
        (1, "a2", T1, T2),
        (1, "a3", T2, None),
    ]


def test_config_and_schema_validation(spark):
    with pytest.raises(ValueError, match="updated_at"):
        SnapshotConfig(unique_key="id", strategy="timestamp")
    with pytest.raises(ValueError, match="check_cols"):
        SnapshotConfig(unique_key="id", strategy="check")
    with pytest.raises(ValueError, match="strategy"):
        SnapshotConfig(unique_key="id", strategy="merge")
    snap = snapshot_apply(None, _src(spark, [(1, "a", T0)]), TS_CFG)
    bad = spark.createDataFrame([(1, "a")], "id int, v string")
    with pytest.raises(ValueError, match="schema mismatch"):
        snapshot_apply(snap, bad, TS_CFG)


def test_meta_cols_constant():
    assert snapshots.META_COLS == [
        "dbt_scd_id",
        "dbt_updated_at",
        "dbt_valid_from",
        "dbt_valid_to",
    ]
