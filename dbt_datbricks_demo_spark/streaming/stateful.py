"""Custom stateful streaming operator via applyInPandasWithState.

The batch pipeline flags individual anomalous readings
(int_sensor_readings_cleaned.sql:74-95); a production monitor wants the
STREAK — "this device has now produced N consecutive anomalous readings"
— which needs per-key state that outlives a micro-batch and cannot be
expressed as a windowed aggregation (the run length is unbounded and
resets on data, not on time). This is the applyInPandasWithState shape:
state = one small record per (device_id, metric_name); each micro-batch
folds its rows into the state in event-time order and emits alert rows
at the moment a streak crosses the threshold.

Scale notes: state is O(#distinct keys) × a few ints — devices × metrics,
not readings. The grouping shuffle is on the same key the silver tables
cluster by. An idle-timeout (ProcessingTimeTimeout) can GC keys for
devices that stop reporting; kept NoTimeout here for determinism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STREAK_OUTPUT_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("metric_name", StringType()),
        StructField("streak_len", IntegerType()),
        StructField("streak_started_ts", TimestampType()),
        StructField("alert_ts", TimestampType()),
    ]
)

# (current streak length, streak start as epoch-µs; -1 = no open streak)
STREAK_STATE_SCHEMA = StructType(
    [StructField("streak", IntegerType()), StructField("started_us", LongType())]
)


def anomaly_streaks(cleaned: DataFrame, threshold: int = 3) -> DataFrame:
    """Emit one alert row each time a (device, metric) accumulates
    `threshold` consecutive anomalous readings. The streak then keeps
    counting but does not re-alert until a non-anomalous reading resets
    it — one page per incident, not one per reading."""

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        streak, started_us = state.get if state.exists else (0, -1)
        alerts: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("reading_ts")
            for ts, is_anomaly in zip(pdf["reading_ts"], pdf["is_anomaly"]):
                if is_anomaly:
                    if streak == 0:
                        started_us = int(pd.Timestamp(ts).value // 1_000)
                    streak += 1
                    if streak == threshold:
                        alerts.append(
                            (
                                key[0], key[1], streak,
                                pd.Timestamp(started_us * 1_000),
                                pd.Timestamp(ts),
                            )
                        )
                else:
                    streak, started_us = 0, -1
        state.update((streak, started_us))
        if alerts:
            yield pd.DataFrame(
                alerts,
                columns=[
                    "device_id", "metric_name", "streak_len",
                    "streak_started_ts", "alert_ts",
                ],
            )

    return (
        cleaned.select("device_id", "metric_name", "reading_ts", "is_anomaly")
        .groupBy("device_id", "metric_name")
        .applyInPandasWithState(
            track,
            outputStructType=STREAK_OUTPUT_SCHEMA,
            stateStructType=STREAK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
