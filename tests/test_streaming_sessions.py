"""Stateful streaming sessionization (streaming/sessions.py) vs the
batch gap-sessionization twin on the same events."""

import os
import time

import pytest
from pyspark.sql import functions as F


def _batch_sessions(spark, rows, gap_s):
    """Batch twin: lag+cumsum gap sessionization (the ev_sessionization
    shape) returning every session, open or closed."""
    from pyspark.sql import Window as W

    e = spark.createDataFrame(rows, "user_id long, t long")
    w = W.partitionBy("user_id").orderBy("t")
    g = e.withColumn(
        "new_s",
        F.when(
            F.lag("t").over(w).isNull() | (F.col("t") - F.lag("t").over(w) > gap_s),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    ws = W.partitionBy("user_id").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    s = g.withColumn("sid", F.sum("new_s").over(ws))
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in s.groupBy("user_id", "sid")
        .agg(
            F.min("t").alias("session_start"),
            F.max("t").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }


def test_stream_matches_batch_for_closed_sessions(spark, tmp_path):
    from marlin_spark.streaming.sessions import sessionize_stream

    gap = 60
    # three users; user 1: two sessions; user 2: one long session; user 3
    # single-event sessions far apart. The LAST session of each user
    # stays open in state (no later event closes it), so expected =
    # batch sessions minus each user's final one.
    batches = [
        # batch 0
        [(1, 100), (1, 130), (2, 100), (3, 100)],
        # batch 1: closes user 1's first session (gap > 60), extends 2
        [(1, 300), (1, 310), (2, 150), (3, 500)],
        # batch 2: closes user 3's 100-session already closed above; add
        # one more far event per user so prior sessions close
        [(1, 1000), (2, 1000), (3, 1000)],
    ]
    src = tmp_path / "events_src"
    os.makedirs(src, exist_ok=True)
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema("user_id long, t long").parquet(str(src))
    sessions = sessionize_stream(stream, gap_s=gap)
    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, "user_id long, t long").coalesce(
                1
            ).write.parquet(str(src / f"b{i}"), mode="overwrite")
            # file source needs files at the top level of the glob; write
            # each batch as its own file via a staged rename
            for f in os.listdir(str(src / f"b{i}")):
                if f.endswith(".parquet"):
                    os.rename(
                        str(src / f"b{i}" / f), str(src / f"batch_{i}.parquet")
                    )
            deadline = time.time() + 60
            while q.isActive and time.time() < deadline:
                q.processAllAvailable()
                break
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    all_rows = [r for b in batches for r in b]
    batch_all = _batch_sessions(spark, all_rows, gap)
    # drop each user's final (still-open) session from the expectation
    final_per_user = {}
    for u, s, e, n in batch_all:
        if u not in final_per_user or s > final_per_user[u][1]:
            final_per_user[u] = (u, s, e, n)
    expected = {
        t for t in batch_all
        if t != final_per_user[t[0]]
    }
    assert got == expected
    assert len(got) > 0


def test_event_time_sessions_deterministic_replay(spark, tmp_path):
    """Event-time variant (watermark + EventTimeTimeout): the same
    disordered input, split into micro-batches three different ways,
    yields the SAME closed sessions — and they equal the batch twin.
    Idle sessions are evicted by watermark advance (the sentinel user's
    far-future event), not by the wall clock."""
    from marlin_spark.streaming.sessions import sessionize_stream_event_time

    gap, wm_delay = 60, 50
    # disordered timeline (out-of-order deliveries marked <); disorder
    # stays under wm_delay at every split point, so no event is dropped
    # as late regardless of where the batching cuts
    rows = [
        (1, 100), (2, 100), (1, 130), (1, 115),  # < user1 s(100,130,3)
        (2, 150), (2, 140),                      # < user2 s(100,150,3)
        (1, 300), (1, 290),                      # < user1 s(290,300,2)
        (2, 400),                                # user2 s(400,400,1)
        (3, 500),                                # user3 s(500,500,1)
    ]
    sentinel = [(99, 10_000)]  # advances the global watermark past all

    def run(batches, name):
        src = tmp_path / f"src_{name}"
        os.makedirs(src, exist_ok=True)
        ckpt = str(tmp_path / f"ckpt_{name}")
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .parquet(str(src))
        )
        q = (
            sessionize_stream_event_time(
                stream, gap_s=gap, watermark=f"{wm_delay} seconds"
            )
            .writeStream.format("memory")
            .queryName(f"evt_sessions_{name}")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            for i, batch in enumerate(batches):
                bdir = src / f"b{i}"
                spark.createDataFrame(batch, "user_id long, t long").select(
                    "user_id", F.timestamp_seconds("t").alias("ts")
                ).coalesce(1).write.parquet(str(bdir), mode="overwrite")
                for f in os.listdir(str(bdir)):
                    if f.endswith(".parquet"):
                        os.rename(str(bdir / f), str(src / f"batch_{i}.parquet"))
                q.processAllAvailable()
            q.processAllAvailable()
        finally:
            q.stop()
        return {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql(f"SELECT * FROM evt_sessions_{name}").collect()
        }

    all_rows = rows + sentinel
    splits = {
        "one": [all_rows],
        "three": [rows[:4], rows[4:8], rows[8:] + sentinel],
        "five": [rows[:2], rows[2:5], rows[5:6], rows[6:], sentinel],
    }
    got = {name: run(b, name) for name, b in splits.items()}
    # every batching closes the same sessions...
    assert got["one"] == got["three"] == got["five"], got
    # ...and they are exactly the batch twin's sessions for users whose
    # close horizon the final watermark passed (everyone but sentinel)
    expected = {
        t for t in _batch_sessions(spark, all_rows, gap) if t[0] != 99
    }
    assert got["one"] == expected, (got["one"], expected)
