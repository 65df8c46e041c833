"""Feature-engineering operators over event streams.

rolling_window_features: per event, aggregates over the trailing time
window of the same key — the classic "user activity in the last hour"
feature family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_window_features(
    events: DataFrame,
    window_s: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per event: count and value-sum of the same key's events inside
    ``[ts - window_s, ts]`` (current event included).

    Scale shape: ONE shuffle (the window partition on ``key_col``) and a
    RANGE frame over integer MICROSECONDS — Spark evaluates it with a
    sliding two-pointer pass per partition, O(rows), never re-scanning
    the window per row. Microseconds (unix_micros), not seconds, so
    sub-second timestamps keep exact window membership (a cast-to-long
    truncation would disagree with interval arithmetic at the window
    edge — and with the SQL oracle). The range frame needs no tiebreak:
    rows with equal timestamps are all in range by definition."""
    # cast handles TIMESTAMP_NTZ inputs (unix_micros only takes TIMESTAMP);
    # the session-tz interpretation shifts every value identically, so
    # window membership is unchanged
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-window_s * 1_000_000, 0)
    )
    return events.select(
        "*",
        F.count("*").over(w).alias(f"cnt_{window_s}s"),
        F.round(F.sum(value_col).over(w), 6).alias(f"sum_{value_col}_{window_s}s"),
    )
