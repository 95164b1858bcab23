"""Stateful streaming operators: applyInPandasWithState dedup and
running aggregates, watermarked window helper.

Reference parity: the host-engine streaming semantics layered over the
changelog (SURVEY §2.9 T9); state checkpointing mirrors consumer-id
resumability (T11).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_table_store_spark.streaming.stateful import (
    running_aggregate,
    sessionize,
    stateful_dedup,
    windowed_aggregate,
)

SCHEMA = "k string, v double, ts timestamp"
T0 = datetime(2024, 1, 1)


def _write_batch(spark, path, rows, n=0):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append" if n else "overwrite"
    ).parquet(path)


def _run(stream_out, ckpt, mode="append"):
    """Drain an availableNow query through foreachBatch (checkpoint-
    recoverable, unlike the memory sink); return collected rows."""
    rows = []

    def sink(df, _bid):
        rows.extend(df.collect())

    q = (
        stream_out.writeStream.foreachBatch(sink)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def test_stateful_dedup_across_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    _write_batch(spark, src, [("a", 1.0, T0), ("b", 2.0, T0), ("a", 3.0, T0)])

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    got = {r["k"] for r in _run(stateful_dedup(stream, keys=["k"]), ckpt)}
    assert got == {"a", "b"}  # in-batch duplicate of 'a' suppressed

    # second run, same checkpoint: 'b' suppressed by persisted state, 'c' new
    _write_batch(spark, src, [("b", 9.0, T0), ("c", 4.0, T0)], n=1)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    got2 = [r["k"] for r in _run(stateful_dedup(stream, keys=["k"]), ckpt)]
    assert got2 == ["c"]


def test_running_aggregate_state(spark, tmp_path):
    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    _write_batch(spark, src, [("x", 1.0, T0), ("x", 2.0, T0), ("y", 5.0, T0)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = _run(running_aggregate(stream, keys=["k"], value_col="v"), ckpt, mode="update")
    got = {r["k"]: (r["cnt"], r["total"]) for r in out}
    assert got == {"x": (2, 3.0), "y": (1, 5.0)}

    # state continues: second batch adds to the running totals
    _write_batch(spark, src, [("x", 4.0, T0)], n=1)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out2 = _run(running_aggregate(stream, keys=["k"], value_col="v"), ckpt, mode="update")
    got2 = {r["k"]: (r["cnt"], r["total"]) for r in out2}
    assert got2 == {"x": (3, 7.0)}


def test_windowed_aggregate_batch_semantics(spark):
    # window helper is usable on batch DataFrames too (same expression)
    df = spark.createDataFrame(
        [
            ("u", 1.0, datetime(2024, 1, 1, 0, 1)),
            ("u", 2.0, datetime(2024, 1, 1, 0, 4)),
            ("u", 7.0, datetime(2024, 1, 1, 0, 11)),
        ],
        SCHEMA,
    )
    out = windowed_aggregate(
        df, "ts", "10 minutes", [F.sum("v").alias("s")], keys=["k"]
    ).collect()
    assert sorted(r["s"] for r in out) == [3.0, 7.0]


def test_sessionize_batch(spark):
    """Gap sessionization: hand-checked boundaries, 1-based per-key
    ordinals, sub-second exactness, and deterministic ties."""
    from flink_table_store_spark.streaming.stateful import sessionize

    rows = [
        # user 1: 3 events in one session, then a 31-min gap
        (1, 1, "2024-01-01 10:00:00"),
        (2, 1, "2024-01-01 10:10:00"),
        (3, 1, "2024-01-01 10:29:59.5"),
        (4, 1, "2024-01-01 11:01:00"),
        # user 2: exactly-at-gap boundary stays in session (>, not >=)
        (5, 2, "2024-01-01 09:00:00"),
        (6, 2, "2024-01-01 09:30:00"),
        # and half a second beyond the gap splits
        (7, 2, "2024-01-01 10:00:00.5"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(
            ev, "ts", gap_seconds=1800, keys=["user_id"],
            order_cols=["event_id"],
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1, 6: 1, 7: 2}
    # NTZ columns take the same path (interval arithmetic, no
    # unix_micros) — identical assignment
    ntz = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got2 = {
        r["event_id"]: r["session_id"]
        for r in sessionize(
            ntz, "ts", gap_seconds=1800, keys=["user_id"],
            order_cols=["event_id"],
        ).collect()
    }
    assert got2 == got


def test_sessionize_random_parity_with_python_reference(spark):
    """Randomized parity: sessionize's keyed lag/cumsum assignment must
    equal a sequential single-machine reference on arbitrary event
    soups (several users, duplicate timestamps, sub-second gaps)."""
    import random
    from datetime import datetime, timedelta

    rnd = random.Random(23)
    base = datetime(2024, 3, 1)
    rows = []
    eid = 0
    for u in range(6):
        t = 0.0
        for _ in range(rnd.randint(0, 40)):
            # mix of sub-gap and super-gap jumps, incl. exact ties
            t += rnd.choice([0.0, 0.5, 30.0, 900.0, 1800.0, 1800.5, 4000.0])
            rows.append((eid, u, base + timedelta(seconds=t)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp"
    )
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(
            ev, "ts", gap_seconds=1800, keys=["user_id"],
            order_cols=["event_id"],
        ).collect()
    }
    # reference: sequential walk in (ts, event_id) order per user
    want = {}
    byu = {}
    for eid_, u, ts in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        prev = byu.get(u)
        if prev is None or (ts - prev[0]).total_seconds() > 1800:
            sid = (prev[1] + 1) if prev else 1
        else:
            sid = prev[1]
        byu[u] = (ts, sid)
        want[eid_] = sid
    assert got == want


def test_sessionize_null_timestamps_get_null_session(spark):
    ev = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, None),
         (3, 1, "2024-01-01 12:00:00")],
        "event_id bigint, user_id bigint, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["event_id"]: r["session_id"]
           for r in sessionize(ev, "ts", 1800, ["user_id"],
                               order_cols=["event_id"]).collect()}
    # the NULL row neither joins a session nor shifts the gap chain
    assert got == {1: 1, 2: None, 3: 2}
