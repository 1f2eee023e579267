"""Search engine: planner + exact scorer + WAND dispatch (SURVEY.md §3.1).

Query lifecycle mapping (reference: api.c -> index_json_query ->
execute_query fan-out -> per-shard squery -> form_result merge):
1. driver-side plan: analyze query text with the same analyzer (search
   mode), look up query terms in the dictionary with bucket partition
   pruning + term pushdown, compute idf (reference: lookup_terms,
   /root/reference/src/main/squery.c:159-166);
2. one Spark job: partition-pruned scan of postings (only the buckets of
   the query terms, only the postings_bytes column — positions are never
   read for BM25), score, global TakeOrderedAndProject top-k;
3. hydration = broadcast join of the top page against docs/
   (reference: query.c:385-401).

Determinism contract (matches the oracle, marlin_spark.oracle.bm25):
ranking key = (round(score, 9) desc, docid asc).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd  # noqa: F401 — resolves stringified UDF type hints
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from marlin_spark.config import EngineConfig
from marlin_spark.index.catalog import IndexCatalog, term_bucket_py
from marlin_spark.oracle.tokenizer import analyze
from marlin_spark.query.wand import make_wand_scorer

DECODE_SCHEMA = "term string, docid long, tf int, dl int"


@dataclass
class QueryPlan:
    query: str
    words: list[str]
    # scoring terms: term -> (idf, slot); slot = index of the required
    # word group (prefix expansions share their word's slot)
    term_meta: dict[str, tuple[float, int]] = field(default_factory=dict)
    n_slots: int = 0
    mode: str = "any"
    k: int = 10
    match_all_docs: bool = False
    total_df: int = 0  # sum of matched terms' dfs (fast-path gate)


def _decode_blocks(batches):
    import pandas as pd

    from marlin_spark.functions.codec import decode_block

    for pdf in batches:
        out_t, out_d, out_tf, out_dl = [], [], [], []
        for term, blob in zip(pdf["term"], pdf["postings"]):
            docids, tfs, dls = decode_block(blob)
            out_t.extend([term] * len(docids))
            out_d.append(docids)
            out_tf.append(tfs)
            out_dl.append(dls)
        if out_t:
            import numpy as np

            yield pd.DataFrame(
                {
                    "term": out_t,
                    "docid": np.concatenate(out_d).astype("int64"),
                    "tf": np.concatenate(out_tf).astype("int32"),
                    "dl": np.concatenate(out_dl).astype("int32"),
                }
            )


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str, config: EngineConfig | None = None):
        self.spark = spark
        self.cat = IndexCatalog(index_dir)
        self.stats = self.cat.read_json("stats.json")
        cfg = config or EngineConfig()
        self.cfg = cfg.with_(
            k1=self.stats.get("k1", cfg.k1),
            b=self.stats.get("b", cfg.b),
            analyzer=self.stats.get("analyzer", cfg.analyzer),
            n_term_buckets=self.stats.get("n_term_buckets", cfg.n_term_buckets),
        )
        self.n_docs = self.stats["n_docs"]
        self.avgdl = self.stats["avgdl"]

    # ------------------------------------------------------------- plan
    def idf(self, df: int) -> float:
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def analyze_query(self, q: str) -> list[str]:
        return sorted({t for t, _ in analyze(q, self.cfg.analyzer, mode="search")})

    def _dictionary_lookup(self, terms: list[str], prefixes: list[str]) -> list[dict]:
        """Partition-pruned + pushed-down dictionary scan, with a
        driver-side term->df cache (the reference keeps its whole trie
        mmap'd; we memoize only the terms actually queried — bounded,
        works at any dictionary size)."""
        cache = getattr(self, "_df_cache", None)
        if cache is None:
            cache = self._df_cache = {}
        if not prefixes and terms and all(t in cache for t in terms):
            return [
                {"term": t, "df": cache[t]} for t in terms if cache[t] is not None
            ]
        if not prefixes and terms:
            # exact-term lookups read the pruned dictionary parquet with
            # pyarrow on the driver — no Spark job (the trie-in-mmap
            # analog); prefix range scans still go through Spark
            try:
                rows = self._dictionary_lookup_arrow(terms)
            except Exception:  # fall back to the Spark scan
                rows = None
            if rows is not None:
                found = {r["term"] for r in rows}
                for r in rows:
                    cache[r["term"]] = r["df"]
                for t in terms:
                    if t not in found:
                        cache[t] = None
                return rows
        d = self.cat.read(self.spark, "dictionary")
        conds = []
        buckets = sorted(
            {term_bucket_py(t, self.cfg.n_term_buckets) for t in terms}
        )
        if terms:
            conds.append(
                F.col("bucket").isin(buckets) & F.col("term").isin(terms)
            )
        for p in prefixes:
            # term range scan over sorted dictionary files (dtrie subtree
            # walk analog, /root/reference/src/main/dtrie.c:642-700)
            conds.append(F.col("term").startswith(p))
        if not conds:
            return []
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        rows = [r.asDict() for r in d.filter(cond).select("term", "df").collect()]
        found = {r["term"] for r in rows}
        for r in rows:
            cache[r["term"]] = r["df"]
        for t in terms:
            if t not in found:
                cache[t] = None  # negative cache: unseen term
        return rows

    def _dictionary_lookup_arrow(self, terms: list[str]) -> list[dict]:
        import pyarrow.dataset as pads

        buckets = sorted(
            {term_bucket_py(t, self.cfg.n_term_buckets) for t in terms}
        )
        dataset = pads.dataset(
            self.cat.path("dictionary"), partitioning="hive", format="parquet"
        )
        tbl = dataset.to_table(
            columns=["term", "df"],
            filter=pads.field("bucket").isin(buckets)
            & pads.field("term").isin(terms),
        )
        return [
            {"term": t, "df": int(d)}
            for t, d in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist())
        ]

    def plan(self, q: str, k: int = 10, mode: str = "any", prefix_last: bool = False) -> QueryPlan:
        # the typed last word must be captured BEFORE sorting: PREFIX_LAST
        # applies to the last word in QUERY order (reference: query.c
        # generate_query_terms applies it at i == num_words-1), while the
        # sorted list only fixes the float accumulation order
        ordered = [t for t, _ in analyze(q, self.cfg.analyzer, mode="search")]
        words = sorted(set(ordered))
        plan = QueryPlan(query=q, words=words, mode=mode, k=min(k, self.cfg.max_hits))
        if not words:
            plan.match_all_docs = True
            return plan
        last_typed = ordered[-1]
        exact_terms = list(words)
        prefixes = []
        if prefix_last:
            prefixes = [last_typed]
            exact_terms = [w for w in words if w != last_typed]
        rows = self._dictionary_lookup(exact_terms or words, prefixes)
        slot_of_word = {w: i for i, w in enumerate(words)}
        for r in rows:
            t = r["term"]
            if t in slot_of_word and not (prefix_last and t == last_typed):
                slot = slot_of_word[t]
            elif prefix_last and t.startswith(last_typed):
                # prefix expansions share the source word's slot so that
                # mode='all' treats "any expansion present" as satisfying
                # the word (oracle: OracleIndex.search required handling)
                slot = slot_of_word[last_typed]
            else:
                continue
            plan.term_meta[t] = (self.idf(r["df"]), slot)
            plan.total_df += int(r["df"])
        plan.n_slots = len(words)
        return plan

    # ----------------------------------------------------------- search
    def _matched_blocks(self, plan: QueryPlan) -> DataFrame:
        posts = self.cat.read(self.spark, "postings")
        terms = list(plan.term_meta)
        buckets = sorted(
            {term_bucket_py(t, self.cfg.n_term_buckets) for t in terms}
        )
        return posts.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def _rank(self, scored: DataFrame, k: int) -> DataFrame:
        return (
            scored.withColumn("score", F.round(F.col("score"), 9))
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def search(
        self,
        q: str,
        k: int = 10,
        mode: str = "any",
        prefix_last: bool = False,
        use_wand: bool = True,
        filter_cond=None,
        local_threshold: int = 0,
    ) -> DataFrame:
        """Top-k BM25. Returns DataFrame(docid, score) ranked.

        filter_cond: optional Catalyst Column over docs/ columns
        (role/tool/ts/...). Filters force the exact path — the filter is
        ANDed before ranking, like the reference
        (/root/reference/src/main/squery.c:377-395).

        local_threshold: if > 0 and the total matched df is below it, the
        query is answered ON THE DRIVER — a pyarrow partition-pruned read
        of the matched blocks + the same numpy WAND scorer, zero Spark
        jobs. This is the adaptive small-query fast path (the analog of
        the reference's fullScanThreshold gate, index.h:24): single-digit
        milliseconds instead of a cluster round-trip, while huge queries
        still fan out. Rank-identical to the distributed paths.
        """
        plan = self.plan(q, k, mode, prefix_last)
        if plan.match_all_docs:
            docs = self.cat.read(self.spark, "docs")
            if filter_cond is not None:
                docs = docs.filter(filter_cond)
            return (
                docs.select("docid")
                .withColumn("score", F.lit(0.0))
                .orderBy("docid")
                .limit(plan.k)
            )
        if not plan.term_meta:
            return self.spark.createDataFrame([], "docid long, score double")
        if filter_cond is None and 0 < plan.total_df <= local_threshold:
            return self._search_local(plan)
        if use_wand and filter_cond is None:
            return self._search_wand(plan)
        return self._search_exact(plan, filter_cond)

    # exact path: full scoring through DataFrame ops (verification path &
    # filtered path)
    def _search_exact(self, plan: QueryPlan, filter_cond=None) -> DataFrame:
        postings = self._decoded_postings(plan)
        meta = self.spark.createDataFrame(
            [(t, float(i), int(s)) for t, (i, s) in plan.term_meta.items()],
            "term string, idf double, slot int",
        )
        k1, b = self.cfg.k1, self.cfg.b
        scored = (
            postings.join(F.broadcast(meta), "term")
            .withColumn(
                "tscore",
                F.col("idf")
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / float(self.avgdl))
                ),
            )
            .groupBy("docid")
            .agg(
                F.sum("tscore").alias("score"),
                F.countDistinct("slot").alias("n_slots"),
            )
        )
        if plan.mode == "all":
            scored = scored.filter(F.col("n_slots") >= plan.n_slots)
        scored = scored.drop("n_slots")
        if filter_cond is not None:
            docs = self.cat.read(self.spark, "docs").filter(filter_cond)
            scored = scored.join(docs.select("docid"), "docid", "left_semi")
        return self._rank(scored, plan.k)

    def _decoded_postings(self, plan: QueryPlan) -> DataFrame:
        blocks = self._matched_blocks(plan).select("term", "postings")
        return blocks.mapInPandas(_decode_blocks, DECODE_SCHEMA)

    # WAND path
    def _search_wand(self, plan: QueryPlan) -> DataFrame:
        sc = self.spark.sparkContext
        acc = {
            "ranges_skipped": sc.accumulator(0),
            "ranges_scored": sc.accumulator(0),
        }
        self._last_wand_counters = acc
        blocks = self._matched_blocks(plan).select(
            "term", "range_id", "block_id", "max_tfnorm", "postings"
        )
        n_part = max(
            1,
            min(
                int(self.spark.conf.get("spark.sql.shuffle.partitions")),
                (self.n_docs // self.cfg.range_size) + 1,
            ),
        )
        scorer = make_wand_scorer(
            plan.term_meta,
            plan.k,
            plan.n_slots,
            plan.mode,
            self.cfg.k1,
            self.cfg.b,
            self.avgdl,
            acc,
        )
        local = blocks.repartition(n_part, "range_id").mapInPandas(
            scorer, "docid long, score double"
        )
        return self._rank(local, plan.k)

    # ------------------------------------ marlin matching semantics
    def match_marlin(self, q: str, prefix_last: bool = True) -> DataFrame:
        """Match set per the reference term algebra: words w1..wn ->
        terms [w1, w1w2, w2, w2w3, ..., wn] + full concatenation; doc
        matches iff every word's (prev-concat | word | next-concat)
        group hits, OR the concatenation hits; last generated term is a
        prefix under PREFIX_LAST (term generation query.c:489-603,
        combine squery.c:212-277). Mirrors OracleIndex.marlin_match."""
        words = [
            t for t, _ in analyze(q, self.cfg.analyzer, mode="search")
        ]
        if not words:
            return self.cat.read(self.spark, "docs").select("docid")
        if len(words) == 1:
            return self._docids_for_terms([words[0]], prefix_last)
        terms: list[str] = []
        for i, w in enumerate(words):
            terms.append(w)
            if i + 1 < len(words):
                terms.append(w + words[i + 1])
        combined = "".join(words)
        nterms = len(terms)
        # group -> member terms (center word + neighbor concats)
        groups: list[list[tuple[str, bool]]] = []
        for i in range(len(words)):
            center = 2 * i
            g = []
            for j in (center - 1, center, center + 1):
                if 0 <= j < nterms:
                    g.append((terms[j], prefix_last and j == nterms - 1))
            groups.append(g)
        parts = []
        for gid, g in enumerate(groups):
            exact = [t for t, p in g if not p]
            pref = [t for t, p in g if p]
            d = self._docids_for(exact, pref)
            parts.append(d.withColumn("gid", F.lit(gid)))
        allg = parts[0]
        for p in parts[1:]:
            allg = allg.unionByName(p)
        anded = (
            allg.distinct()
            .groupBy("docid")
            .agg(F.count("*").alias("ng"))
            .filter(F.col("ng") >= len(groups))
            .select("docid")
        )
        comb = self._docids_for_terms([combined], prefix_last)
        return anded.unionByName(comb).distinct()

    def _docids_for_terms(self, terms: list[str], prefix: bool) -> DataFrame:
        if prefix:
            return self._docids_for([], terms)
        return self._docids_for(terms, [])

    def _docids_for(self, exact: list[str], prefixes: list[str]) -> DataFrame:
        """Distinct docids holding any of the terms / prefix expansions
        (posting-list OR, reference squery.c:72-142)."""
        rows = self._dictionary_lookup(exact, prefixes)
        matched = [r["term"] for r in rows]
        matched = [
            t
            for t in matched
            if t in exact or any(t.startswith(p) for p in prefixes)
        ]
        if not matched:
            return self.spark.createDataFrame([], "docid long")
        posts = self.cat.read(self.spark, "postings")
        buckets = sorted(
            {term_bucket_py(t, self.cfg.n_term_buckets) for t in matched}
        )
        blocks = posts.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(matched)
        ).select("term", "postings")
        return blocks.mapInPandas(_decode_blocks, DECODE_SCHEMA).select(
            "docid"
        ).distinct()

    # ------------------------------------------ driver-local fast path
    def search_local(self, q: str, k: int = 10, mode: str = "any",
                     prefix_last: bool = False) -> list[tuple[int, float]]:
        """Answer a small query entirely on the driver (no Spark job):
        pyarrow partition-pruned block read + the same numpy WAND scorer.
        Returns [(docid, score)] ranked. Rank-identical to search()."""
        plan = self.plan(q, k, mode, prefix_last)
        if plan.match_all_docs or not plan.term_meta:
            df = self.search(q, k, mode, prefix_last)
            return [(r["docid"], r["score"]) for r in df.collect()]
        return self._local_topk(plan)

    def _local_topk(self, plan: QueryPlan) -> list[tuple[int, float]]:
        import pyarrow.dataset as pads

        from marlin_spark.query.wand import make_wand_scorer

        terms = list(plan.term_meta)
        buckets = sorted(
            {term_bucket_py(t, self.cfg.n_term_buckets) for t in terms}
        )
        dataset = pads.dataset(
            self.cat.path("postings"), partitioning="hive", format="parquet"
        )
        tbl = dataset.to_table(
            columns=["term", "range_id", "block_id", "max_tfnorm", "postings"],
            filter=pads.field("bucket").isin(buckets)
            & pads.field("term").isin(terms),
        )
        pdf = tbl.to_pandas()
        scorer = make_wand_scorer(
            plan.term_meta,
            plan.k,
            plan.n_slots,
            plan.mode,
            self.cfg.k1,
            self.cfg.b,
            self.avgdl,
        )
        out = next(scorer(iter([pdf])))
        ranked = sorted(
            zip(out["docid"], out["score"]),
            key=lambda ds: (-round(float(ds[1]), 9), int(ds[0])),
        )[: plan.k]
        return [(int(d), float(s)) for d, s in ranked]

    def _search_local(self, plan: QueryPlan) -> DataFrame:
        rows = self._local_topk(plan)
        return self.spark.createDataFrame(
            [(d, float(round(s, 9))) for d, s in rows], "docid long, score double"
        )

    # ----------------------------------------------------- phrase match
    def phrase_match(self, q: str) -> DataFrame:
        """Exact phrase match from positional postings: doc matches iff
        the query words appear at consecutive positions in order. This is
        the consumer of the positions column (only phrase/proximity
        queries ever read it — BM25 scans prune it away). The reference
        declared a phrase index but never wrote it
        (/root/reference/src/main/sindex.c:718-724); our standard
        positional layout gets it for free. Mirrors
        oracle.bm25.phrase_match_oracle."""
        words = [t for t, _ in analyze(q, self.cfg.analyzer, mode="search")]
        if not words:
            return self.cat.read(self.spark, "docs").select("docid")
        rows = self._dictionary_lookup(words, [])
        found = {r["term"] for r in rows}
        if not all(w in found for w in words):
            return self.spark.createDataFrame([], "docid long")
        buckets = sorted(
            {term_bucket_py(t, self.cfg.n_term_buckets) for t in words}
        )
        blocks = self.cat.read(self.spark, "postings").filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(list(set(words)))
        ).select("term", "range_id", "postings", "positions")

        word_seq = list(words)

        def matcher(batches):
            import numpy as np
            import pandas as pd

            from marlin_spark.functions.codec import decode_block, decode_positions

            # positions per (term, docid) within this doc-range partition
            posmap: dict = {}
            for pdf in batches:
                for term, pb, xb in zip(pdf["term"], pdf["postings"], pdf["positions"]):
                    docids, tfs, _ = decode_block(bytes(pb))
                    poss = decode_positions(bytes(xb), tfs)
                    off = 0
                    for d, tf in zip(docids, tfs):
                        key = (term, int(d))
                        cur = posmap.setdefault(key, set())
                        cur.update(int(p) for p in poss[off : off + int(tf)])
                        off += int(tf)
            first = word_seq[0]
            out = []
            for (term, d), poss in posmap.items():
                if term != first:
                    continue
                rest = [posmap.get((w, d)) for w in word_seq[1:]]
                if any(r is None for r in rest):
                    continue
                if any(
                    all((p + i + 1) in rest[i] for i in range(len(rest)))
                    for p in poss
                ):
                    out.append(d)
            yield pd.DataFrame({"docid": pd.Series(sorted(out), dtype="int64")})

        n_part = max(
            1,
            min(
                int(self.spark.conf.get("spark.sql.shuffle.partitions")),
                (self.n_docs // self.cfg.range_size) + 1,
            ),
        )
        return blocks.repartition(n_part, "range_id").mapInPandas(
            matcher, "docid long"
        )

    # ---------------------------------------------- typo (fuzzy) match
    def typo_match(self, q: str, prefix_last: bool = True) -> DataFrame:
        """Damerau-Levenshtein fuzzy match set, reference semantics
        (maxdist 0/1/2 by length, prefix subtree walk — see
        oracle/typo.py; goldens from levenshtein.robot). The dictionary
        scan pushes a length band down to parquet, then an Arrow-batched
        UDF runs the banded OSA DP per candidate term — the distributed
        analog of the reference's trie walk (dtrie.c:702-791)."""
        from marlin_spark.oracle.typo import maxdist, term_matches

        words = [t for t, _ in analyze(q, self.cfg.analyzer, mode="search")]
        if not words:
            return self.cat.read(self.spark, "docs").select("docid")
        word = words[0]  # single-word fuzzy lookup, like lookup_typo
        d = maxdist(len(word))
        dic = self.cat.read(self.spark, "dictionary")
        lo = max(1, len(word) - d)
        cand = dic.filter(F.length("term") >= lo)
        if not prefix_last:
            cand = cand.filter(F.length("term") <= len(word) + d)

        @F.pandas_udf("boolean")
        def _matches(terms: pd.Series) -> pd.Series:
            return terms.map(lambda t: term_matches(word, t, prefix_last, d))

        matched = [r["term"] for r in cand.filter(_matches(F.col("term"))).select("term").collect()]
        if not matched:
            return self.spark.createDataFrame([], "docid long")
        return self._docids_for(matched, [])

    # ------------------------------------------------------- hydration
    def hydrate(self, hits: DataFrame) -> DataFrame:
        """Join top-k ids back to stored turns (broadcast the tiny side —
        reference: query.c:385-401 fetch+decompress)."""
        docs = self.cat.read(self.spark, "docs")
        return docs.join(F.broadcast(hits), "docid").orderBy(
            F.desc("score"), F.asc("docid")
        )

    # ------------------------------------------------- batched queries
    def search_many_wand(self, queries: dict[str, str], k: int = 10, mode: str = "any") -> DataFrame:
        """Batched block-max WAND: one dictionary lookup + one pruned
        postings scan for ALL queries; each block decoded once per range,
        per-query theta pruning, per-partition top-k — avoids the exact
        path's |candidates| x |queries| shuffle entirely."""
        from marlin_spark.query.wand import make_batch_wand_scorer

        per_q = {qid: self.analyze_query(q) for qid, q in queries.items()}
        all_terms = sorted({t for ts in per_q.values() for t in ts})
        df_map = {
            r["term"]: r["df"] for r in self._dictionary_lookup(all_terms, [])
        }
        metas: dict[str, dict] = {}
        n_slots: dict[str, int] = {}
        for qid, terms in per_q.items():
            meta = {
                t: (self.idf(df_map[t]), slot)
                for slot, t in enumerate(terms)
                if t in df_map
            }
            if meta:
                metas[qid] = meta
                n_slots[qid] = len(terms)
        if not metas:
            return self.spark.createDataFrame(
                [], "query_id string, docid long, score double, rank int"
            )
        matched = sorted({t for m in metas.values() for t in m})
        buckets = sorted(
            {term_bucket_py(t, self.cfg.n_term_buckets) for t in matched}
        )
        blocks = (
            self.cat.read(self.spark, "postings")
            .filter(F.col("bucket").isin(buckets) & F.col("term").isin(matched))
            .select("term", "range_id", "block_id", "max_tfnorm", "postings")
        )
        n_part = max(
            1,
            min(
                int(self.spark.conf.get("spark.sql.shuffle.partitions")),
                (self.n_docs // self.cfg.range_size) + 1,
            ),
        )
        scorer = make_batch_wand_scorer(
            metas, n_slots, k, mode, self.cfg.k1, self.cfg.b, self.avgdl
        )
        local = blocks.repartition(n_part, "range_id").mapInPandas(
            scorer, "query_id string, docid long, score double"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc(F.round("score", 9)), F.asc("docid")
        )
        return (
            local.withColumn("score", F.round("score", 9))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "docid", "score", "rank")
        )

    def search_many(self, queries: dict[str, str], k: int = 10, mode: str = "any") -> DataFrame:
        """Score MANY queries in one Spark job (throughput path for the
        wrk-style benchmark set). ONE dictionary lookup for the union of
        all query terms (not one driver job per query), one postings scan,
        per-query top-k via window."""
        per_q = {qid: self.analyze_query(q) for qid, q in queries.items()}
        all_terms = sorted({t for ts in per_q.values() for t in ts})
        df_map = {
            r["term"]: r["df"] for r in self._dictionary_lookup(all_terms, [])
        }
        rows = []
        for qid, terms in per_q.items():
            for slot, t in enumerate(terms):
                if t in df_map:
                    rows.append(
                        (qid, t, float(self.idf(df_map[t])), slot, len(terms))
                    )
        if not rows:
            return self.spark.createDataFrame(
                [], "query_id string, docid long, score double, rank int"
            )
        meta = self.spark.createDataFrame(
            rows, "query_id string, term string, idf double, slot int, n_slots int"
        )
        all_terms = sorted({r[1] for r in rows})
        buckets = sorted(
            {term_bucket_py(t, self.cfg.n_term_buckets) for t in all_terms}
        )
        posts = self.cat.read(self.spark, "postings").filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(all_terms)
        )
        decoded = posts.select("term", "postings").mapInPandas(
            _decode_blocks, DECODE_SCHEMA
        )
        k1, b = self.cfg.k1, self.cfg.b
        scored = (
            decoded.join(F.broadcast(meta), "term")
            .withColumn(
                "tscore",
                F.col("idf")
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / float(self.avgdl))
                ),
            )
            .groupBy("query_id", "docid")
            .agg(
                F.sum("tscore").alias("score"),
                F.countDistinct("slot").alias("got_slots"),
                F.first("n_slots").alias("n_slots"),
            )
        )
        if mode == "all":
            scored = scored.filter(F.col("got_slots") >= F.col("n_slots"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc(F.round("score", 9)), F.asc("docid")
        )
        return (
            scored.withColumn("score", F.round("score", 9))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "docid", "score", "rank")
        )
