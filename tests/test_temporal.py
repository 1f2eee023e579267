"""asof_join / range_join_bucketed (operators/temporal.py) vs brute force."""

import random

from pyspark.sql import functions as F


def _mk(seed=7, n_users=5, n=120):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (i, rnd.randrange(n_users), rnd.choice(["l", "r"]), rnd.randrange(0, 500))
        )
    return rows  # (event_id, user, side, t)


def test_asof_join_matches_bruteforce(spark):
    from marlin_spark.operators.temporal import asof_join

    rows = _mk()
    df = spark.createDataFrame(rows, "event_id long, user long, side string, t long")
    left = df.filter("side = 'l'")
    right = (
        df.filter("side = 'r'")
        .withColumnRenamed("event_id", "rid")
        .withColumn("rt", F.col("t"))
    )
    out = asof_join(
        left, right, key="user", ts="t", left_id="event_id",
        right_id="rid", right_payload=("rt",),
    )
    got = {
        r["event_id"]: (r["rid"], r["rt"]) for r in out.collect()
    }
    # brute force: latest right at-or-before; max rid breaks ts ties
    for eid, u, side, t in rows:
        if side != "l":
            continue
        cands = [
            (rt, rid)
            for rid, ru, rside, rt in rows
            if rside == "r" and ru == u and rt <= t
        ]
        want = max(cands) if cands else None
        if want is None:
            assert got[eid] == (None, None)
        else:
            assert got[eid] == (want[1], want[0]), (eid, got[eid], want)


def test_range_join_matches_bruteforce(spark):
    from marlin_spark.operators.temporal import range_join_bucketed

    rows = _mk(seed=11)
    df = spark.createDataFrame(rows, "event_id long, user long, side string, t long")
    left = df.filter("side = 'l'").withColumnRenamed("event_id", "lid")
    right = df.filter("side = 'r'").withColumnRenamed("event_id", "rid")
    W = 90
    for bucket in (90, 40, 200):  # window==bucket, finer, coarser
        out = range_join_bucketed(
            left, right, key="user", ts="t", left_id="lid",
            right_id="rid", window_s=W, bucket_s=bucket,
        )
        got = {(r["lid"], r["rid"]) for r in out.collect()}
        want = {
            (lid, rid)
            for lid, lu, ls, lt in rows
            if ls == "l"
            for rid, ru, rs, rt in rows
            if rs == "r" and ru == lu and lt - W <= rt <= lt
        }
        assert got == want, f"bucket={bucket}"
        # no duplicate pairs from multi-bucket replication
        assert out.count() == len(got), f"bucket={bucket}"
