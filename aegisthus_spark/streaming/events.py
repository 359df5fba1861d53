"""Streaming analogs of the batch event queries (queries.py ev_*): the
operators a continuously-fed events table needs — watermarked windowed
rollups, gap-based sessionization via ``session_window``, and custom
stateful latest-per-key via ``applyInPandasWithState``.

These run on any streaming DataFrame with the events schema
(event_id, ts, user_id, event_type, value, props); ``read_events_stream``
tails a parquet directory of event files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: events file schema; ts is parquet timestamp[us] read as TimestampType
EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

#: legacy layout: ts stored as TIMESTAMP(NANOS), readable only as a raw long
EVENTS_DDL_NANOS = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    nanos_ts: bool = False,
) -> DataFrame:
    """Tail a parquet directory of event files as a stream.

    ``nanos_ts=True`` handles the legacy TIMESTAMP(NANOS) layout, where
    Spark can only surface the column as a raw long (SPARK-40819): it is
    read as nanos and floor-divided to micros, the same normalization as
    the batch loader (queries._events).
    """
    ddl = EVENTS_DDL_NANOS if nanos_ts else EVENTS_DDL
    reader = spark.readStream.schema(ddl).option("recursiveFileLookup", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    out = reader.parquet(events_dir)
    if nanos_ts:
        out = out.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return out


def stream_daily_rollup(events: DataFrame, *, watermark: str = "1 day") -> DataFrame:
    """Event-time daily counts/sums per event type; late data beyond the
    watermark is dropped, state is bounded (one day closes at a time)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("day.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_sessionize(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based sessions per user — the built-in ``session_window`` merges
    events within ``gap`` of each other, the streaming analog of the batch
    lag()+running-sum sessionization (queries.py ev_sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("session"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def stream_dedup(
    events: DataFrame, *, keys: tuple[str, ...] = ("event_id",), watermark: str = "1 day"
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: the state entry for a key
    is dropped once the watermark passes its event time, so state size is
    O(keys arriving within the watermark window), not O(all keys ever seen)
    — the form that survives a continuous 100 TB ingest. A duplicate
    arriving later than ``watermark`` after the original is (by contract)
    not dropped; pick the watermark from the source's max duplicate lag.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_latest_per_user(events: DataFrame) -> DataFrame:
    """Custom stateful operator: the latest event per user, maintained with
    ``applyInPandasWithState`` (arbitrary state, update mode) — the pattern
    for operators Spark's built-in aggregations can't express.

    Deterministic: ties on ts break on the higher event_id, mirroring the
    batch ``max_by(..., struct(unix_micros(ts), event_id))`` in
    queries.ev_latest_per_user, so the result is independent of arrival
    order and a batch SQL oracle can check it exactly.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, ts timestamp, event_id long, event_type string, value double"
    )
    state_schema = "ts long, event_id long, event_type string, value double"

    def keep_latest(key, pdf_iter, state: GroupState):
        if state.exists:
            best_us, best_id, best_type, best_val = state.get
        else:
            best_us = best_id = best_type = best_val = None
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            us = pdf["ts"].astype("int64") // 1000  # ns -> us epoch
            idx = (
                pd.DataFrame({"us": us, "eid": pdf["event_id"].astype("int64")})
                .sort_values(["us", "eid"])
                .index[-1]
            )
            row_us = int(us.loc[idx])
            row_id = int(pdf.loc[idx, "event_id"])
            if best_us is None or (row_us, row_id) > (best_us, best_id):
                best_us, best_id = row_us, row_id
                best_type = str(pdf.loc[idx, "event_type"])
                best_val = float(pdf.loc[idx, "value"])
        state.update((best_us, best_id, best_type, best_val))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "ts": [pd.Timestamp(best_us * 1000, unit="ns")],
                "event_id": [best_id],
                "event_type": [best_type],
                "value": [best_val],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        keep_latest,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_join(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "1 day"
) -> DataFrame:
    """Watermarked stream-stream INNER join: each purchase pairs with every
    click by the same user in the preceding ``gap``.

    The hard part of stream-stream joins is state eviction, and the join
    condition here is written so Spark can derive it: the time-range
    predicate (c_ts in [p_ts - gap, p_ts]) plus watermarks on BOTH sides
    lets the engine drop buffered clicks once the purchase-side watermark
    passes p_ts, and buffered purchases once the click-side watermark
    passes p_ts + gap — state is bounded by watermark + gap, not by the
    stream length. Append output mode (the only mode stream-stream joins
    support); interval arithmetic is fixed-duration, so results are
    TZ-independent.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts <= purchases.p_ts)
        & (clicks.c_ts >= purchases.p_ts - F.expr(f"interval {gap}")),
        "inner",
    ).select("p_id", "user_id", "p_ts", "c_id", "c_ts")


def stream_distinct_sketch(
    events: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    m: int | None = None,
) -> DataFrame:
    """Streaming distinct-count sketch state: cumulative per-register MIN
    of the normalized value hash (operators.sketch stage 1) over the
    stream.

    The state per group is exactly ``m`` doubles NO MATTER how many
    distinct values flow past — the streaming counterpart of the batch
    FM/KMV sketch, and the reason to sketch at all: a streaming
    COUNT(DISTINCT) would hold every distinct key in the state store
    forever, while the register MINs are bounded by construction (so no
    watermark is required for state health). Drain in complete mode and
    fold with ``operators.sketch.sketch_estimate`` — the estimates equal
    the batch sketch on the same (bounded) input bit-for-bit, because MIN
    is order- and batching-insensitive.
    """
    from ..operators.sketch import M_REGISTERS, sketch_registers

    return sketch_registers(
        events, key_cols, value_col, m=M_REGISTERS if m is None else m
    )


def stream_cms_sketch(
    events: DataFrame,
    key_col: str,
    *,
    d: int | None = None,
    w: int | None = None,
) -> DataFrame:
    """Streaming count-min sketch state: cumulative COUNT per (hash row,
    bucket) over the stream — d*w bounded counters per sketch, the same
    no-watermark-needed state argument as :func:`stream_distinct_sketch`
    (COUNT, like MIN, is batching- and order-insensitive, so the drained
    state equals the batch sketch). Fold the drained state with
    :func:`operators.sketch.cms_estimate_topk`; defaults come from the
    sketch module's CMS_D/CMS_W so stream build and batch fold can never
    disagree on the bucket space.
    """
    from ..operators.sketch import CMS_D, CMS_W, _cms_coords

    d = CMS_D if d is None else d
    w = CMS_W if w is None else w
    return (
        _cms_coords(events, key_col, d=d, w=w)
        .select("j", "b")
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
