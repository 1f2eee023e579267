"""Similarity search over embedding columns (array<float>).

Two paths, per the task spec:
- brute_force_topk: exact cosine over the full corpus — JVM-side fold
  (zip_with + aggregate), whole-stage codegen, parallel scan +
  TakeOrderedAndProject. The exactness baseline.
- lsh_topk: random-hyperplane LSH — sign-bit bucket per row, candidates
  = query's bucket only. At 100 TB the bucket column is precomputed and
  the table is partitioned by it, so a query is a partition-pruned scan
  of corpus/2^n_planes. (An IVF variant = replace sign buckets with
  nearest-centroid assignment; same plumbing.)

Oracle-pinned fixed-parameter forms live in entry_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _lit_vec(vec) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def _py_norm(vec) -> float:
    """The literal query vector's norm, folded planner-side: the same
    sequential double *, + and sqrt the JVM fold applies to the same
    values in the same order — bit-identical, and the per-row plan
    drops a 64-element fold."""
    import math

    acc = 0.0
    for v in vec:
        acc = acc + float(v) * float(v)
    return math.sqrt(acc)  # correctly-rounded IEEE sqrt, same as the JVM's


def brute_force_topk(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = _lit_vec(query_vec)
    cos = dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(_py_norm(query_vec)))
    return (
        emb.select(id_col, cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def with_lsh_bucket(
    emb: DataFrame, planes: list, vec_col: str = "embedding"
) -> DataFrame:
    """Adds a sign-bit bucket column (one bit per hyperplane). Precompute
    + partitionBy this column for partition-pruned ANN at scale."""
    bits = [
        F.when(dot(F.col(vec_col), _lit_vec(p)) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return emb.withColumn("lsh_bucket", F.concat(*bits))


def lsh_topk(
    emb: DataFrame,
    query_vec,
    planes: list,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket."""
    b = with_lsh_bucket(emb, planes, vec_col)
    qbits = "".join(
        "1" if sum(float(x) * float(y) for x, y in zip(query_vec, p)) >= 0 else "0"
        for p in planes
    )
    q = _lit_vec(query_vec)
    cos = dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(_py_norm(query_vec)))
    return (
        b.filter(F.col("lsh_bucket") == qbits)
        .select(id_col, cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked (label or LSH bucket) —
    refuses the unblocked quadratic join by default."""
    if block_col is None:
        raise ValueError(
            "near_dup_pairs requires a blocking column (a label or an "
            "lsh_bucket from with_lsh_bucket) — an unblocked self-join "
            "is quadratic and will not survive scale"
        )
    # row norms once per ROW (before the join) instead of once per PAIR
    # — identical expression values either way (same port as the
    # emb_near_dup entry, round 6)
    x = emb.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("ea"),
        norm(F.col(vec_col)).alias("na"),
    )
    y = emb.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("eb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    c = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        x.join(y, "_blk")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", c.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
