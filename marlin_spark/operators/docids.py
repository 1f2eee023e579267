"""Deterministic dense docid assignment at cluster scale.

The reference assigns dense per-shard uint32 docids on a single writer
thread (/root/reference/src/main/sdata.c:100-134). Distributed, the same
determinism comes from defining docid := global rank of the unique key
(conv_id, turn_idx) — a pure function of the data, independent of
partitioning, sampling or executor count (BASELINE.json requires stable
turn ordering; never ``monotonically_increasing_id``).

Implementation avoids the single-partition global window:
1. range-repartition + sort by the key (distributed sort),
2. count rows per partition (tiny driver-side cumsum -> offsets),
3. per-partition row_number + broadcast-joined offset.

The repartitioned frame is persisted so steps 2 and 3 observe the same
(sampled) range boundaries; correctness does not depend on the sampling —
only on both jobs seeing the same one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def with_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "docid",
    num_partitions: int | None = None,
    start: int = 1,
) -> DataFrame:
    """Add ``id_col`` = dense 1-based rank of ``order_cols`` (unique key)."""
    spark = df.sparkSession
    n = num_partitions or spark.conf.get("spark.sql.shuffle.partitions")
    part = df.repartitionByRange(int(n), *order_cols).sortWithinPartitions(
        *order_cols
    )
    part = part.withColumn("_pid", F.spark_partition_id())
    part.persist(StorageLevel.MEMORY_AND_DISK)
    counts = part.groupBy("_pid").count().orderBy("_pid").collect()
    offsets = {}
    acc = start - 1
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    spark_offsets = spark.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()],
        "pid int, _offset long",
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        part.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(spark_offsets), F.col("_pid") == F.col("pid"))
        .withColumn(id_col, (F.col("_offset") + F.col("_rn")).cast("long"))
        .drop("_pid", "pid", "_rn", "_offset")
    )
    return out
