"""Custom stateful streaming operators (applyInPandasWithState) and
event-time window helpers.

The reference delegates windowed/stateful stream computation to the
host engine over its changelog (SURVEY §2.9 T9: "not in reference —
Flink SQL computes windows over the changelog"). The Spark-native
equivalents live here so a pipeline reading this engine's changelog
stream gets the same semantics:

- ``windowed_aggregate`` / ``session_aggregate``: watermarked
  tumble/slide/session windows — pure built-ins, stay in Tungsten.
- ``stateful_dedup``: keyed exactly-once emission across micro-batches
  via ``applyInPandasWithState`` (Arrow-batched; state = one boolean
  per key, optional TTL). The classic CDC/ingest guard: downstream
  sees each key once per TTL window regardless of replays — state
  lives in the checkpoint, sharded by Spark's own key partitioning,
  so it scales horizontally with executors at 100 TB ingest rates.
- ``running_aggregate``: per-key running counters (count/sum) emitted
  per batch — the upsert-stream shape that feeds a PK table with the
  aggregation merge engine.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_aggregate(
    stream: DataFrame,
    time_col: str,
    window: str,
    aggs: list[Column],
    slide: str | None = None,
    keys: list[str] | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation
    (``F.window`` — SURVEY §2.9 T9)."""
    win = F.window(F.col(time_col), window, slide or window)
    return (
        stream.withWatermark(time_col, delay)
        .groupBy(win.alias("window"), *[F.col(k) for k in (keys or [])])
        .agg(*aggs)
    )


def session_aggregate(
    stream: DataFrame,
    time_col: str,
    gap: str,
    aggs: list[Column],
    keys: list[str] | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Watermarked session windows (``F.session_window``)."""
    win = F.session_window(F.col(time_col), gap)
    return (
        stream.withWatermark(time_col, delay)
        .groupBy(win.alias("session"), *[F.col(k) for k in (keys or [])])
        .agg(*aggs)
    )


def stateful_dedup(
    stream: DataFrame,
    keys: list[str],
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Emit the FIRST row seen per key across the stream's lifetime;
    suppress every later occurrence (exact streaming dedup).

    State per key is a single boolean in the checkpoint; with
    ``ttl_minutes`` the key re-emits after the TTL (bounded state —
    required for unbounded key domains at scale).
    """
    out_schema = stream.schema
    cols = stream.columns

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            if state.hasTimedOut:
                state.remove()
            else:
                for _ in pdfs:  # drain; emit nothing
                    pass
                if ttl_minutes is not None:
                    state.setTimeoutDuration(ttl_minutes * 60_000)
                return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]][cols]
        state.update((True,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60_000)
        if first is not None:
            yield first

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.groupBy(*[F.col(k) for k in keys])
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def running_aggregate(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum) emitted once per micro-batch —
    an upsert changelog suitable for a PK table with the aggregation
    merge engine (SURVEY §2.4 A2)."""
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in stream.schema if f.name in keys
    )
    out_schema = f"{key_fields}, cnt long, total double"

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((cnt, total))
        yield pd.DataFrame([[*key, cnt, total]], columns=[*keys, "cnt", "total"])

    return (
        stream.groupBy(*[F.col(k) for k in keys])
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="cnt long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sessionize(
    df: DataFrame,
    time_col: str = "ts",
    gap_seconds: int = 1800,
    keys: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """BATCH gap-based sessionization — the offline complement of
    ``session_aggregate``'s streaming session windows: within each key,
    a new session starts whenever the gap to the previous event exceeds
    ``gap_seconds``; ``session_id`` is the key-scoped session ordinal
    (1-based). The classic lag-then-cumsum assignment, entirely
    replayable in ANSI SQL.

    Scale: the window is KEYED (per user/entity), so each group is one
    range — events-per-key is bounded in practice; there is exactly one
    shuffle, on the key. The gap compares as a timestamp-minus-timestamp
    INTERVAL, which is microsecond-exact and works for both TIMESTAMP
    and TIMESTAMP_NTZ columns (unix_micros rejects NTZ; a
    seconds-resolution diff would mis-split sub-second straddles). Pass
    ``order_cols`` (e.g. an event id) to break equal-timestamp ties
    deterministically. Rows with a NULL timestamp get a NULL
    session_id — they have no position on the timeline."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    keys = keys or ["user_id"]
    order = [F.col(time_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    ts = F.col(time_col)
    gap = F.expr(f"INTERVAL {int(gap_seconds)} SECOND")
    new_session = F.when(ts - F.lag(ts).over(w) > gap, 1).otherwise(0)
    # the first event of a key has lag NULL -> comparison NULL -> 0;
    # cumsum starts at 0, so +1 makes session ids 1-based
    sid = (
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        + 1
    )
    # NULL timestamps have no position on the timeline: they get a NULL
    # session_id instead of riding NULLS-FIRST sort placement into
    # session 1 (and silently shifting every real session's gap chain)
    with_ts = df.where(ts.isNotNull()).withColumn(
        "session_id", sid.cast("bigint")
    )
    nulls = df.where(ts.isNull()).withColumn(
        "session_id", F.lit(None).cast("bigint")
    )
    return with_ts.unionByName(nulls)
