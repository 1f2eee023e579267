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
