"""As-of (nearest-key temporal) join — the time-series primitive Spark
lacks natively: for every left row, the latest right row with the same
keys and ``on``-value ≤ the left's (direction='backward'; 'forward' takes
the earliest ≥; 'nearest' the closer of the two, ties → backward, pandas
merge_asof semantics).

Spark-first shape: the join is expressed as UNION + one window pass —
tag both inputs, sort each key partition by (on, side), and carry the
last-seen right payload forward with last(ignorenulls) — so the whole
operator is ONE shuffle (the window partitioning) and zero joins. The
naive formulation (range join + row_number) shuffles both sides AND
explodes the range; pandas' merge_asof is single-node. This form
partitions by the join keys, so it scales to any number of keys and
skew-mitigates like any window (salt the key if one user dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    right_cols: tuple[str, ...] | None = None,
    direction: str = "backward",
    tolerance_expr: F.Column | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Every left row, plus the matched right row's ``on`` value and
    ``right_cols`` (NULL when no right row qualifies).

    Ties: right rows sharing the same (by, on) are folded by "last in
    window order", which is only deterministic if the right side is
    unique per (by, on) — pre-aggregate it if it isn't (the contract
    entry dedups by max event_id). ``tolerance_expr`` (e.g.
    ``F.expr("INTERVAL 1 HOUR")``) voids matches farther than the
    tolerance from the left row, mirroring pandas merge_asof.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(direction)
    internal = {"_r", "_is_l", "_m"}
    if direction == "nearest":
        internal |= {"_mb", "_mf", "_mb2", "_mf2"}
    reserved = internal & (set(left.columns) | set(right.columns))
    if reserved:
        # withColumn would silently OVERWRITE a caller column of the same
        # name and the internal drop would then remove it from the output
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)}; "
            "rename them first")
    rc = tuple(right_cols) if right_cols is not None else tuple(
        c for c in right.columns if c not in by and c != on)
    payload = F.struct(
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rc])

    l_tag = left.withColumn("_r", F.lit(None).cast(
        right.select(payload.alias("_r")).schema["_r"].dataType
    )).withColumn("_is_l", F.lit(1))
    # left carries its full row; right rows only need key + payload —
    # everything else rides as typed NULLs so the union lines up
    keep = set(by) | {on}
    ltypes = dict(left.dtypes)
    r_tag = right.select(
        *[F.col(c) if c in keep else F.lit(None).cast(ltypes[c]).alias(c)
          for c in left.columns],
        payload.alias("_r"), F.lit(0).alias("_is_l"),
    )
    u = l_tag.unionByName(r_tag)

    # right sorts before left at equal `on` (0 < 1): a reference AT the
    # query timestamp is visible to it — in BOTH directions, so an exact
    # hit wins outright under 'nearest' too
    wb = (Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col("_is_l").asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy(*by).orderBy(F.col(on).desc(), F.col("_is_l").asc())
          .rowsBetween(Window.unboundedPreceding, 0))

    def _void_far(m, d):
        # tolerance: NULL the match when it sits farther than the
        # tolerance from the left row, mirroring pandas merge_asof
        if tolerance_expr is None:
            return F.col(m)
        lo, hi = ((F.col(f"{m}.{on}{suffix}"), F.col(on)) if d == "backward"
                  else (F.col(on), F.col(f"{m}.{on}{suffix}")))
        return F.when(hi <= lo + tolerance_expr, F.col(m))

    if direction == "nearest":
        # one exchange (same partition keys), two in-partition sorts; the
        # closer candidate wins, ties -> backward (pandas semantics)
        matched = (u.withColumn("_mb", F.last("_r", ignorenulls=True).over(wb))
                   .withColumn("_mf", F.last("_r", ignorenulls=True).over(wf)))
        out = matched.filter(F.col("_is_l") == 1).drop("_r", "_is_l")
        b = _void_far("_mb", "backward")
        f = _void_far("_mf", "forward")
        out = (out.withColumn("_mb2", b).withColumn("_mf2", f)
               .withColumn(
                   "_m",
                   F.when(F.col("_mb2").isNull(), F.col("_mf2"))
                   .when(F.col("_mf2").isNull(), F.col("_mb2"))
                   .when(F.col(on) - F.col(f"_mb2.{on}{suffix}")
                         <= F.col(f"_mf2.{on}{suffix}") - F.col(on),
                         F.col("_mb2"))
                   .otherwise(F.col("_mf2")))
               .drop("_mb", "_mf", "_mb2", "_mf2"))
    else:
        w = wb if direction == "backward" else wf
        matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        out = matched.filter(F.col("_is_l") == 1).drop("_r", "_is_l")
        out = out.withColumn("_m", _void_far("_m", direction))
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col(f"_m.{on}{suffix}").alias(f"{on}{suffix}"),
        *[F.col(f"_m.{c}{suffix}").alias(f"{c}{suffix}") for c in rc],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    lower_s: float,
    upper_s: float,
    by: tuple[str, ...] = ("user_id",),
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Interval (range) join: every (left, right) pair sharing ``by`` with
    ``right_ts ∈ [left_ts + lower_s, left_ts + upper_s]`` — the "events in
    the N minutes after each incident" primitive. Column names other than
    ``by`` must not collide (pre-rename one side).

    Spark-first shape: a raw BETWEEN theta-join degenerates to a per-key
    nested loop; instead both sides are BINNED into windows of width
    w = upper − lower on the microsecond axis — a left row's admissible
    interval has width exactly w, so it overlaps AT MOST TWO consecutive
    bins. The left side explodes into those ≤2 bins and the join is a
    pure EQUI-join on (by…, bin) that hashes/shuffles/AQE-skew-splits
    like any other, followed by the exact range filter. Replication
    factor is a constant 2, independent of data, window size, or skew.
    Microseconds (unix_micros) keep boundary membership exact and
    SQL-oracle-portable (same discipline as rolling_window_features)."""
    if not upper_s > lower_s:
        raise ValueError("need upper_s > lower_s")
    lo_us = int(round(lower_s * 1_000_000))
    hi_us = int(round(upper_s * 1_000_000))
    # derive the bin width from the ROUNDED endpoints (r4 advice): three
    # independent round() calls could disagree by 1µs, letting an interval
    # span 3 bins while only the 2 endpoint bins are exploded (silent
    # row loss) — and a sub-µs window would floor to w=0 (null bins).
    w_us = hi_us - lo_us
    if w_us <= 0:
        raise ValueError(
            f"interval [{lower_s}, {upper_s}]s rounds to an empty "
            "microsecond window; widen it to at least 1µs")
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    l = left.withColumn("_lus", l_us).withColumn(
        "_bin",
        F.explode(F.array_distinct(F.array(
            F.floor((F.col("_lus") + lo_us) / w_us),
            F.floor((F.col("_lus") + hi_us) / w_us),
        ))),
    )
    r = right.withColumn("_rus", r_us).withColumn(
        "_bin", F.floor(F.col("_rus") / w_us))
    return (
        l.join(r, [*by, "_bin"])
        .filter((F.col("_rus") >= F.col("_lus") + lo_us)
                & (F.col("_rus") <= F.col("_lus") + hi_us))
        .drop("_bin", "_lus", "_rus")
    )
