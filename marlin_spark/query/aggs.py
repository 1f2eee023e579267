"""Facet counts + metric aggregations over matched docs (SURVEY.md §2.5).

Reference request shape {"aggs": {name: {op: {"field": f}}}} with ops
max/min/avg/stats/cardinality (/root/reference/src/main/metric-aggs.c),
plus per-facet-field top-N value counts with default maxFacetResults=10
(/root/reference/src/main/index.h:23, counting docrank.c:371-389,
shard merge query.c:39-92).

Spark's partial+final hash aggregation IS the reference's
consume-per-shard + merge-at-gather design (aggs.h:35-52), so every op
here is a plain groupBy/agg — exact, including cardinality (the
reference's cardinality is exact too; HLL was an acknowledged TODO,
metric-aggs.c:11 — approx_count_distinct is exposed as the scale
variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(
    docs: DataFrame, matched: DataFrame | None, field: str, n: int = 10
) -> DataFrame:
    """Top-n value counts of ``field`` over matched docs.
    matched: DataFrame with a docid column (None = all docs).
    Exact distributed count — no per-shard 2x oversampling / post-sampling
    correction needed (reference: squery.c:411-457, query.c:39-92)."""
    base = docs if matched is None else docs.join(matched.select("docid"), "docid", "left_semi")
    return (
        base.filter(F.col(field).isNotNull())
        .groupBy(field)
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc(field))
        .limit(n)
    )


_METRIC_OPS = {
    "max": lambda c: F.max(c).alias("max"),
    "min": lambda c: F.min(c).alias("min"),
    "avg": lambda c: F.avg(c).alias("avg"),
    "sum": lambda c: F.sum(c).alias("sum"),
    "count": lambda c: F.count(c).alias("count"),
    "cardinality": lambda c: F.countDistinct(c).alias("cardinality"),
    "cardinality_approx": lambda c: F.approx_count_distinct(c).alias(
        "cardinality_approx"
    ),
}


def metric_aggs(
    docs: DataFrame, matched: DataFrame | None, aggs: dict[str, dict]
) -> dict:
    """aggs: {name: {"op": one of max|min|avg|sum|count|cardinality|stats,
    "field": column}}. Returns {name: value | {stats dict}} —
    single-row results collected to the driver like the reference's
    response JSON (metric-aggs.c:145-218)."""
    base = docs if matched is None else docs.join(matched.select("docid"), "docid", "left_semi")
    exprs, stats_names = [], []
    for name, spec in aggs.items():
        op, field = spec["op"], spec["field"]
        if op == "stats":
            # sum/avg/min/max/count in ONE pass (reference needs one
            # consume fn; Spark fuses all five into one hash agg)
            for sub in ("sum", "avg", "min", "max", "count"):
                exprs.append(_METRIC_OPS[sub](field).alias(f"{name}__{sub}"))
            stats_names.append(name)
        else:
            exprs.append(_METRIC_OPS[op](field).alias(name))
    row = base.agg(*exprs).collect()[0].asDict()
    out: dict = {}
    for name, spec in aggs.items():
        if spec["op"] == "stats":
            out[name] = {
                sub: row[f"{name}__{sub}"]
                for sub in ("sum", "avg", "min", "max", "count")
            }
        else:
            out[name] = row[name]
    return out


def doc_size_stats(docs: DataFrame) -> dict:
    """min/max/sum/avg of per-doc stored sizes — the reference /stats
    endpoint reports index-blob sizes (sindex.c:66-97, index.c:331-353);
    here the stored doc is the turn text."""
    row = docs.agg(
        F.min(F.length("text")).alias("min"),
        F.max(F.length("text")).alias("max"),
        F.sum(F.length("text")).alias("sum"),
        F.avg(F.length("text")).alias("avg"),
        F.count("*").alias("count"),
    ).collect()[0]
    return row.asDict()
