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


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    by: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered-funnel analysis: per key, did the event sequence contain
    ``steps`` as a (not necessarily contiguous) subsequence in time order?
    Emits (key, n_events, reached) plus ``depth`` — how many funnel steps
    were completed in order (``reached`` ⇔ depth == len(steps)). The
    classic product-analytics "view → click → purchase" question, done
    without MATCH_RECOGNIZE (which Spark lacks).

    Scale shape: ONE shuffle — the per-key groupBy. The subsequence scan
    is an aggregate fold over the key's time-sorted event-type array
    (collect_list + array_sort on a (ts, id, type) struct: the struct
    sort makes the order total and deterministic, and keeps everything
    JVM-side). State per key is the event array — bounded by per-key
    activity, the same bound any sessionization carries; heavy keys are
    the caller's salting decision."""
    if not steps:
        raise ValueError("empty funnel")
    seq = F.array_sort(F.collect_list(F.struct(
        F.col(ts_col).alias("t"), F.col(id_col).alias("i"),
        F.col(type_col).alias("e"))))
    types = F.transform(seq, lambda x: x["e"])
    steps_arr = F.array(*[F.lit(s) for s in steps])
    # fold: depth advances when the current event matches the next step
    depth = F.aggregate(
        types,
        F.lit(0),
        lambda acc, e: F.when(
            (acc < len(steps)) & (e == F.element_at(steps_arr, acc + 1)),
            acc + 1).otherwise(acc),
    )
    return (
        events.groupBy(F.col(by).alias("key"))
        .agg(F.count("*").alias("n_events"), depth.alias("depth"))
        .select(
            F.col("key").alias(by),
            "n_events",
            F.col("depth").cast("int").alias("depth"),
            (F.col("depth") == len(steps)).alias("reached"),
        )
    )


def value_histogram(
    df: DataFrame,
    lo: float,
    hi: float,
    n_bins: int = 10,
    value_col: str = "value",
    group_col: str = "event_type",
) -> DataFrame:
    """Equi-width histogram of ``value_col`` per group over the fixed range
    [lo, hi) — the monitoring primitive behind per-metric distribution
    dashboards and drift alerts. The range is caller-fixed (not derived
    from the data) so the operator is ONE pass, deterministic, and bins
    are comparable across runs/days; out-of-range values clamp into the
    edge bins so the counts always total the input.

    Emits (group, bin, bin_lo, bin_hi, n). Scale shape: a pure map to the
    bin index then ONE partial-aggregated groupBy — nothing else."""
    if not (hi > lo and n_bins > 0):
        raise ValueError("need hi > lo and n_bins > 0")
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.select(F.col(group_col).alias("grp"), b.alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("grp").alias(group_col),
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("bin_hi"),
            "n",
        )
    )
