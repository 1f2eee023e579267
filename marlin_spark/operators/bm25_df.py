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
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Returns (``id_col``, *extra_cols, score) for all matching docs,
    unranked.

    Robertson idf ln((N-df+0.5)/(df+0.5)+1), identical to the oracle
    (marlin_spark.oracle.bm25) and the block index.

    Shape (round-6): per-doc tf/dl come straight off the token ARRAY
    (size/filter column math) instead of explode + corpus-wide
    (doc, term) / (doc) aggregations — the query only ever needs tf for
    its own handful of terms, so the whole pipeline is two narrow scans:
    one aggregate job for (N, avgdl, df_t...) and one match/score scan,
    with zero exchanges (the old plan carried 4 tokenize passes and 3
    joins through 18 exchanges). The per-term idf/tf/dl expression trees
    are kept literally identical to the previous form so scores are
    bit-equal; df/n are exact integers either way.
    """
    terms = simple_terms(query)
    n_terms = len(terms)
    if n_terms == 0:
        return docs.select(F.col(id_col), F.lit(0.0).alias("score"))
    toks_arr = F.filter(
        F.split(F.lower(F.col(text_col)), SIMPLE_SPLIT), lambda t: t != ""
    )
    base = docs.select(
        F.col(id_col).alias("_doc"),
        *[F.col(c) for c in extra_cols],
        toks_arr.alias("_toks"),
    ).withColumn("_dl", F.size("_toks"))
    def _eq(term):
        # NB: a 2-arg lambda would make F.filter pass the element INDEX
        # as the second argument — bind the term via closure instead
        return lambda x: x == term

    for i, t in enumerate(terms):
        base = base.withColumn(
            f"_tf{i}", F.size(F.filter(F.col("_toks"), _eq(t)))
        )
    # one bounded job: collection stats + per-query-term document
    # frequencies (the planner lookup the old path did with a collect
    # plus an extra in-plan aggregation)
    stats = base.agg(
        F.count(F.when(F.col("_dl") > 0, F.lit(1))).alias("n"),
        F.avg(F.when(F.col("_dl") > 0, F.col("_dl"))).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"_tf{i}") > 0, F.lit(1))).alias(f"df{i}")
            for i in range(n_terms)
        ],
    ).collect()[0]
    n, avgdl = float(stats["n"]), float(stats["avgdl"] or 1.0)
    tscs = []
    for i in range(n_terms):
        dfi = int(stats[f"df{i}"])
        idf = F.log((n - F.lit(dfi) + 0.5) / (F.lit(dfi) + 0.5) + 1.0)
        tf = F.col(f"_tf{i}")
        tscs.append(
            idf
            * tf
            * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("_dl") / avgdl))
        )
    score = tscs[0]
    for tsc in tscs[1:]:
        score = score + tsc
    matched = [F.col(f"_tf{i}") > 0 for i in range(n_terms)]
    any_match = matched[0]
    for m in matched[1:]:
        any_match = any_match | m
    scored = base.filter(any_match)
    if mode == "all":
        nt = matched[0].cast("int")
        for m in matched[1:]:
            nt = nt + m.cast("int")
        scored = scored.filter(nt >= n_terms)
    return scored.select(
        F.col("_doc").alias(id_col),
        *[F.col(c) for c in extra_cols],
        score.alias("score"),
    )


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
