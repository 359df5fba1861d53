"""Temporal operators: distributed as-of join.

An as-of join attaches, to every left row, the nearest right row at or
before (backward) / at or after (forward) its timestamp within the same
key — the standard way to align two event streams (trades↔quotes, feature
lookback joins for training data). Spark has no native ASOF JOIN, and the
naive formulations fall over at scale:

- range join (``l.ts >= r.ts``) explodes to O(|L|·|R|) per key;
- per-key ``applyInPandas`` ships both sides through Python.

The scalable formulation used here is UNION + WINDOW: tag each side, union
both (right rows carry the right payload, left rows carry the left
payload), and run one ``last(payload) IGNORE NULLS`` window partitioned by
key. Cost = ONE hash shuffle of |L|+|R| rows and a streaming per-key sort —
the same shape as any windowed aggregation, with no row multiplication and
no second join. At 100 TB both sides shuffle once on the join key; skewed
keys are handled the same way as any hot window key (AQE / pre-salting
upstream), not worse.

Determinism: right rows carry a ``seq_col`` tiebreak. The match for a left
row is the right row with the greatest ``(ts, seq)`` such that
``r.ts <= l.ts`` (backward; exact-ts matches included — right rows order
before left rows on the same timestamp). Forward mirrors with the nearest
``r.ts >= l.ts``, greatest seq among equals.

The reference has no temporal join surface; this extends the engine for
training-data pipelines (feature as-of alignment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    seq_col: str | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Attach the nearest right row per key to every left row.

    Parameters
    ----------
    on: join key column(s) present in both sides.
    ts_col: event-time column present in both sides (orderable).
    right_cols: right payload columns to attach (default: all non-key,
        non-ts columns of ``right``); each appears as ``{prefix}{col}``,
        plus ``{prefix}{ts_col}`` with the matched right timestamp.
    seq_col: right column breaking ties among equal timestamps
        deterministically (greatest wins). Required when right may hold
        duplicate (key, ts) pairs.
    direction: 'backward' (r.ts <= l.ts, nearest) or 'forward'
        (r.ts >= l.ts, nearest).
    tolerance: optional Column interval (e.g. ``F.expr("INTERVAL 1 HOUR")``)
        — matches farther than this from the left timestamp are nulled.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, ts_col)]
    left_rest = [c for c in left.columns if c not in keys]

    r_pay = F.struct(
        F.col(ts_col).alias(ts_col), *[F.col(c).alias(c) for c in right_cols]
    )
    l_pay = F.struct(*[F.col(c).alias(c) for c in left_rest])
    seq = F.col(seq_col) if seq_col else F.lit(0)
    # NULL event times match nothing: null-ts right rows are dropped, and
    # the window orders nulls FIRST in both directions so a null-ts left
    # row sorts before every right row and sees no payload.
    right = right.filter(F.col(ts_col).isNotNull())
    r_u = right.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        seq.alias("_seq"),
        r_pay.alias("_rpay"),
        F.lit(None).alias("_lpay"),
    )
    l_u = left.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_u.schema["_seq"].dataType).alias("_seq"),
        F.lit(None).cast(r_u.schema["_rpay"].dataType).alias("_rpay"),
        l_pay.alias("_lpay"),
    )
    r_u = r_u.withColumn("_lpay", F.lit(None).cast(l_u.schema["_lpay"].dataType))

    sign = 1 if direction == "backward" else -1
    # Right rows must order BEFORE left rows at the same timestamp so exact
    # matches are visible; among equal-ts right rows the greatest seq wins
    # (it is the last one the frame sees).
    order = [
        (F.col("_ts").asc_nulls_first() if sign == 1 else F.col("_ts").desc_nulls_first()),
        F.col("_side").asc(),
        # seq ascends in BOTH directions: the frame's last-seen right row
        # wins, so ascending seq makes the greatest seq the match among
        # equal timestamps.
        F.col("_seq").asc(),
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r_u.unionByName(l_u)
        .withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        in_range = (
            F.col("_ts") - F.col("_match")[ts_col] <= tolerance
            if direction == "backward"
            else F.col("_match")[ts_col] - F.col("_ts") <= tolerance
        )
        matched = matched.withColumn(
            "_match", F.when(in_range, F.col("_match"))
        )
    out = [
        F.col(c) if c in keys else F.col("_lpay")[c].alias(c)
        for c in left.columns
    ]
    out += [F.col("_match")[ts_col].alias(f"{prefix}{ts_col}")]
    out += [F.col("_match")[c].alias(f"{prefix}{c}") for c in right_cols]
    return matched.select(*out)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str | list[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket: str = "30 minutes",
) -> DataFrame:
    """Range (interval-containment) join without the nested loop: every
    point row is matched to every interval of the same key with
    ``start <= point_ts < end`` (half-open).

    A direct theta join (``p.ts BETWEEN i.start AND i.end``) is a
    nested-loop per key — O(|P|·|I|) and a CartesianProduct at the planner
    level when keys are hot. The scalable formulation BINS time: each point
    belongs to exactly one fixed-width bucket; each interval is exploded to
    the buckets it covers (``len/bucket + 1`` rows — bounded when interval
    length is bounded, and ≤2 when intervals are no longer than the bucket
    width). The join is then a plain equi-join on (key, bucket) with the
    exact containment check as a post-filter — hashable, broadcastable,
    AQE-skew-splittable, everything a range join is not. Pick ``bucket``
    near the typical interval length.

    Output: the interval row's columns + the matched point's columns (the
    caller projects/aggregates).
    """
    keys = [on] if isinstance(on, str) else list(on)
    # bucket width in micros, TZ-independently: timestamp_micros(0) is the
    # epoch INSTANT (a string literal would parse in the session TZ and
    # could even make the step zero in a +1h zone)
    step = F.unix_micros(F.timestamp_micros(F.lit(0)) + F.expr(f"INTERVAL {bucket}"))
    p_b = points.withColumn("_bk", (F.unix_micros(F.col(point_ts)) / step).cast("long"))
    i_b = intervals.withColumn(
        "_bks",
        F.sequence(
            (F.unix_micros(F.col(start_col)) / step).cast("long"),
            # end is exclusive, but a point in end's bucket can still precede
            # it; ceil via (end-1) keeps the explosion tight
            ((F.unix_micros(F.col(end_col)) - 1) / step).cast("long"),
        ),
    ).withColumn("_bk", F.explode("_bks")).drop("_bks")
    joined = i_b.join(p_b, [*keys, "_bk"]).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_bk")
