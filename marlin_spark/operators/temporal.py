"""Temporal join operators: as-of join and bounded time-range join.

Beyond-reference ops (the reference has no event-time joins); both are
named in the build brief as operators Spark lacks natively and are the
bread-and-butter of event/transcript analytics at 100 TB:

- ``asof_join``: for every left row, the latest right row with
  ``right.ts <= left.ts`` on the same key. Implemented as the
  sort-merge-style UNION-TAG pattern — union both sides with a tag
  column, ONE shuffle on (key), one window pass carrying the last seen
  right row forward — instead of an inequality join (which Spark plans
  as a per-key cartesian) or a per-row lookup. Work is O(|L|+|R|) rows
  through one exchange, so it survives a 100x scale-up; skewed keys
  behave like any window (AQE skew hints apply).

- ``range_join_bucketed``: all (left, right) pairs on the same key with
  ``right.ts in [left.ts - window, left.ts]``. The naive form is an
  inequality join (BroadcastNestedLoop / cartesian per key); here the
  right side is replicated into ceil(window/bucket)+1 coarse time
  buckets and the join becomes an EQUI-join on (key, bucket) + a cheap
  residual range filter — collision-proportional work, the standard
  bucketed range-join decomposition (same shape as DataFusion/Trino
  range-join optimizations and our dedup LSH bucket joins).

Both are deterministic under ties: ordering keys always include the
unique event id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    left_id: str,
    right_id: str,
    right_payload: tuple[str, ...] = (),
    time_chunk: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row at-or-before its
    timestamp on the same key (NULLs if none). Returns the left columns
    (key, ts, left_id) plus ``<right_id>`` and ``right_payload`` columns
    from the matched right row.

    Tie rule: right rows at exactly left.ts DO match; among right rows
    sharing the winning timestamp the one with the largest right_id
    wins (window-ordered (ts, tag, id) so the scan is deterministic).

    The matched right row is carried as ONE struct (rid + payloads) so a
    right row whose payload value is legitimately NULL is still the row
    returned — per-column ``last(ignorenulls)`` carries would tear the
    row, mixing fields from different right rows. ``right_id`` keeps its
    native type (string/UUID ids work; no silent cast-to-NULL).

    ``time_chunk`` (same units as ``ts``; epoch seconds for timestamps)
    opts into the skew-safe two-pass plan: Window.partitionBy(key) puts
    EVERY event of one key in a single task, so a Zipf-hot key is a
    straggler at scale. Chunked, pass 1 windows within (key, time-chunk)
    — parallel across chunks — and pass 2 carries each chunk's last
    right row across chunk boundaries via a window over the tiny
    one-row-per-(key, chunk) tail table, then a join back. Output is
    identical to the unchunked plan (tested in test_temporal).
    """
    rid_t = right.schema[right_id].dataType
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.col(left_id).alias("_lid"),
        F.lit(None).cast(rid_t).alias("_rid"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}")
          for c in right_payload],
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(left.schema[left_id].dataType).alias("_lid"),
        F.col(right_id).alias("_rid"),
        *[F.col(c).alias(f"_p_{c}") for c in right_payload],
    )
    u = lt.unionByName(rt)
    # the matched right row as one atomic value; NULL for left rows (the
    # when() gate — a struct of NULL fields would itself be non-NULL)
    rstruct = F.when(
        F.col("_tag") == 0,
        F.struct(F.col("_rid"), *[F.col(f"_p_{c}") for c in right_payload]),
    )
    part_cols = ["_k"]
    if time_chunk is not None:
        u = u.withColumn(
            "_c", F.floor(F.col("_t").cast("double") / F.lit(time_chunk))
        )
        part_cols = ["_k", "_c"]
    # tag=0 (right) sorts before tag=1 (left) at equal ts, so an
    # at-or-before right row is always already seen when its left row
    # is scanned; _rid ascending makes "largest right_id wins" the
    # last-seen value.
    w = (
        Window.partitionBy(*part_cols)
        .orderBy("_t", "_tag", "_rid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *part_cols,
        "_t",
        "_tag",
        "_lid",
        F.last(rstruct, ignorenulls=True).over(w).alias("_m"),
    ).filter(F.col("_tag") == 1)
    if time_chunk is not None:
        # pass 2: each (key, chunk)'s LAST right row (max (_t, _rid) among
        # tag=0 rows) -> running latest over strictly-earlier chunks per
        # key. One row per non-empty (key, chunk): the window here is
        # over the tail table, not the events, so a hot key costs O(its
        # chunk count), not O(its row count).
        # spine = every (key, chunk) that holds ANY row: a left row in a
        # right-empty chunk still needs the carry from earlier chunks
        # max_by's ordering key is NULL for left rows, so they are
        # ignored; a right-empty chunk yields a NULL tail but keeps its
        # spine row (so its left rows still receive the carry)
        tails = u.groupBy("_k", "_c").agg(
            F.max_by(
                rstruct,
                F.when(F.col("_tag") == 0, F.struct("_t", "_rid")),
            ).alias("_tail")
        )
        wc = (
            Window.partitionBy("_k")
            .orderBy("_c")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_in = tails.select(
            "_k",
            "_c",
            F.last("_tail", ignorenulls=True).over(wc).alias("_carry"),
        ).filter(F.col("_carry").isNotNull())
        carried = carried.join(carry_in, ["_k", "_c"], "left").withColumn(
            "_m", F.coalesce(F.col("_m"), F.col("_carry"))
        )
    return carried.select(
        F.col("_k").alias(key),
        F.col("_t").alias(ts),
        F.col("_lid").alias(left_id),
        F.col("_m._rid").alias(right_id),
        *[F.col(f"_m._p_{c}").alias(c) for c in right_payload],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    left_id: str,
    right_id: str,
    window_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """All (left, right) pairs on the same key with
    ``left.ts - window_s <= right.ts <= left.ts``, as an equi-join on
    (key, time bucket). Timestamps are epoch seconds (long columns).

    The right side is exploded into the buckets its rows can be seen
    from (its own bucket plus the next ceil(window/bucket)); the left
    probes only its own bucket. A pair can collide in exactly one
    bucket (the left row's), so no post-join dedup is needed.
    """
    bucket_s = bucket_s or window_s
    n_extra = -(-window_s // bucket_s)  # ceil
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_lt"),
        F.col(left_id).alias(left_id),
        (F.col(ts) / bucket_s).cast("long").alias("_b"),
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_rt"),
        F.col(right_id).alias(right_id),
        F.explode(
            F.sequence(
                (F.col(ts) / bucket_s).cast("long"),
                (F.col(ts) / bucket_s).cast("long") + n_extra,
            )
        ).alias("_b"),
    )
    return (
        lt.join(rt, ["_k", "_b"])
        .filter(
            (F.col("_rt") <= F.col("_lt"))
            & (F.col("_rt") >= F.col("_lt") - window_s)
        )
        .select(
            F.col("_k").alias(key),
            left_id,
            right_id,
            F.col("_lt").alias(f"{ts}_left"),
            F.col("_rt").alias(f"{ts}_right"),
        )
    )
