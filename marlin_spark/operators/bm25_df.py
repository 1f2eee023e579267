"""BM25 as a pure-Catalyst DataFrame pipeline (no UDFs, no prebuilt index).

This is the engine's *verification-grade* scoring path: the same math as
the block index + WAND path, but derived on the fly from any document
DataFrame with whole-stage-codegen'd expressions only — so it is (a)
expressible 1:1 in ANSI SQL for the DuckDB oracle, and (b) runnable under
any SparkSession without shipping Python code to workers.

Uses the "simple" analyzer (lowercase, split on non-[a-z0-9]) which is
SQL-portable; the marlin-fidelity analyzer lives in the pandas_udf path
(functions/analyzers.py) and is covered by the pytest rank-identity suite.

Scale notes: tokenize+explode+two hash aggregations; the terms DataFrame
is broadcast; the final top-k is TakeOrderedAndProject. At 100 TB you
would not re-derive df/dl per query — that is exactly what the prebuilt
block index (index/build.py) is for; this path is for verification and
for one-shot batch scoring.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIMPLE_SPLIT = "[^a-z0-9]+"


def simple_terms(q: str) -> list[str]:
    return sorted({t for t in re.split(SIMPLE_SPLIT, q.lower()) if t})


def tokens_df(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) exploded token stream, simple analyzer."""
    return docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), SIMPLE_SPLIT), lambda t: t != ""
            )
        ).alias("term"),
    )


def bm25_scores(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    mode: str = "any",
) -> DataFrame:
    """Returns (``id_col``, score) for all matching docs, unranked.

    Robertson idf ln((N-df+0.5)/(df+0.5)+1), identical to the oracle
    (marlin_spark.oracle.bm25) and the block index.
    """
    terms = simple_terms(query)
    spark = docs.sparkSession
    toks = tokens_df(docs, id_col, text_col)
    tf = toks.groupBy("_doc", "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("_doc").agg(F.count("*").alias("dl"))
    n_terms = len(terms)
    if n_terms == 0:
        return docs.select(F.col(id_col), F.lit(0.0).alias("score"))
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n, avgdl = float(stats["n"]), float(stats["avgdl"])
    df_ = (
        tf.join(F.broadcast(qdf), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(df_), "term")
        .join(dl, "_doc")
        .withColumn("idf", F.log((n - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0))
        .withColumn(
            "tsc",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)),
        )
        .groupBy("_doc")
        .agg(F.sum("tsc").alias("score"), F.count("*").alias("_nt"))
    )
    if mode == "all":
        scored = scored.filter(F.col("_nt") >= n_terms)
    return scored.select(F.col("_doc").alias(id_col), "score")


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "any",
    round_dp: int = 6,
) -> DataFrame:
    """Ranked top-k: (id, score rounded) — deterministic tie-break by id."""
    scored = bm25_scores(docs, query, id_col, text_col, mode=mode)
    return (
        scored.withColumn("score", F.round("score", round_dp))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_sql(
    query: str,
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    mode: str = "any",
    round_dp: int = 6,
    extra_ctes: str = "",
    post_filter_sql: str | None = None,
) -> str:
    """The ANSI-SQL twin of bm25_topk, runnable by DuckDB (oracle side).

    Kept textually parallel to the DataFrame pipeline above: same idf,
    same norm, same rounding, same (score desc, id asc) tie-break.
    extra_ctes: prepended CTE definitions (e.g. a derived transcripts
    view) so ``table`` can reference them. post_filter_sql: boolean over
    alias ``src`` (= ``table`` re-joined on id) applied to the match set
    AFTER scoring — marlin filter semantics (squery.c:377-395: stats are
    index-wide, the filter ANDs the match set)."""
    terms = simple_terms(query)
    pre = f"WITH {extra_ctes}, " if extra_ctes else "WITH "
    if not terms:
        head = f"WITH {extra_ctes} " if extra_ctes else ""
        return (
            f"{head}SELECT {id_col}, 0.0 AS score FROM {table} "
            f"ORDER BY {id_col} LIMIT {k}"
        )
    values = ", ".join(f"('{t}')" for t in terms)
    having = f"HAVING count(*) >= {len(terms)}" if mode == "all" else ""
    post = ""
    if post_filter_sql:
        post = (
            f"JOIN {table} src ON src.{id_col} = scored._doc "
            f"WHERE {post_filter_sql}"
        )
    return f"""
{pre}toks AS (
  SELECT {id_col} AS _doc,
         unnest(string_split_regex(lower({text_col}), '[^a-z0-9]+')) AS term
  FROM {table}
), toks2 AS (SELECT * FROM toks WHERE term <> ''),
tf AS (SELECT _doc, term, count(*)::DOUBLE AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT _doc, count(*)::DOUBLE AS dl FROM toks2 GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
q(term) AS (VALUES {values}),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf JOIN q USING (term) GROUP BY 1),
scored AS (
  SELECT tf._doc,
         sum(
           ln((stats.n - dfs.df + 0.5)/(dfs.df + 0.5) + 1.0)
           * tf.tf * {k1 + 1.0}
           / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl))
         ) AS score,
         count(*) AS _nt
  FROM tf
  JOIN q USING (term) JOIN dfs USING (term)
  JOIN dl ON dl._doc = tf._doc CROSS JOIN stats
  GROUP BY 1 {having}
)
SELECT _doc AS {id_col}, round(score, {round_dp}) AS score
FROM scored {post}
ORDER BY round(score, {round_dp}) DESC, _doc ASC
LIMIT {k}
""".strip()
