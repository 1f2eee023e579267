"""Index build pipeline (SURVEY.md §3.2 Spark mapping; north rule core).

Stages, each a resumable manifest unit:

  A "docs"        transcripts -> deterministic docids (dense rank over
                  (conv_id, turn_idx)) -> tokenize (Arrow pandas_udf) ->
                  dl -> write docs/ partitioned by doc range; collection
                  stats (n_docs, avgdl) -> stats.json.
                  [reference analog: sdata_add_documents + doc blob sizes,
                   /root/reference/src/main/sdata.c:162-181, sindex.c:66-97]

  B "postings:gK" per term-bucket group: re-derive tokens from docs/,
                  posexplode, shuffle by the SALTED key (term, range_id),
                  sortWithinPartitions, mapInPandas block builder ->
                  delta+varbyte blocks with skip pointers + block-max ->
                  dynamic-partition-overwrite into postings/bucket=NN/.
                  [reference analog: string_new_word_pos + si_write_end
                   batch flush, /root/reference/src/main/sindex.c:658-726,184-254]

  C "dictionary"  postings -> groupBy(term): df, cf, n_blocks (merge
                  fan-in), global max_tfnorm; dense term_id by sorted term
                  -> dictionary/bucket=NN/ (sorted-by-term files => parquet
                  min/max stats give prefix range pruning).
                  [reference analog: dtrie word->wid,
                   /root/reference/src/main/dtrie.c:452-484]

Counters (Spark accumulators -> manifest -> counters.json): postings
emitted, blocks built, bytes compressed, merge fan-in. A killed build
rerun with the same build_id skips completed units; a bucket-group's
partition overwrite is idempotent.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marlin_spark.config import EngineConfig
from marlin_spark.functions.analyzers import tokens_col
from marlin_spark.index.blocks import BLOCK_SCHEMA, make_block_builder
from marlin_spark.index.catalog import IndexCatalog, term_bucket_col
from marlin_spark.index.manifest import BuildManifest
from marlin_spark.operators.docids import with_dense_ids

DOC_COLS = ["docid", "conv_id", "turn_idx", "role", "tool", "ts", "text", "dl"]


class IndexBuilder:
    def __init__(self, spark: SparkSession, index_dir: str, config: EngineConfig | None = None):
        self.spark = spark
        self.cfg = config or EngineConfig()
        self.cat = IndexCatalog(index_dir)

    # ------------------------------------------------------------------
    def build(self, transcripts: DataFrame, build_id: str = "build-0", resume: bool = True) -> dict:
        self._transcripts = transcripts
        mf = BuildManifest(self.cat.dir, build_id)
        t0 = time.time()
        stage_secs = {}
        if not (resume and mf.is_done("docs")):
            self._stage_docs(mf)
        stage_secs["docs"] = round(time.time() - t0, 2)
        # stage A wrote docs/; stats needed by the block builder
        stats = self.cat.read_json("stats.json")

        t1 = time.time()
        groups = self._bucket_groups()
        for g, buckets in enumerate(groups):
            unit = f"postings:g{g}"
            if resume and mf.is_done(unit):
                continue
            self._stage_postings(mf, unit, buckets, stats)
        stage_secs["postings"] = round(time.time() - t1, 2)

        t2 = time.time()
        if not (resume and mf.is_done("dictionary")):
            self._stage_dictionary(mf)
        stage_secs["dictionary"] = round(time.time() - t2, 2)

        counters = mf.counters()
        counters["stage_seconds"] = stage_secs
        counters["build_seconds"] = round(time.time() - t0, 3)
        counters["n_docs"] = stats["n_docs"]
        self.cat.write_json("counters.json", counters)
        return counters

    # ------------------------------------------------------------------
    def _stage_docs(self, mf: BuildManifest) -> None:
        cfg = self.cfg
        # transcripts arrive as an external DataFrame; builder reads it once
        src = self._transcripts
        docs = with_dense_ids(src, ["conv_id", "turn_idx"], "docid",
                              num_partitions=cfg.build_partitions)
        docs = (
            docs.withColumn("_toks", tokens_col(F.col("text"), cfg.analyzer, "index"))
            .withColumn("dl", F.size("_toks"))
            .withColumn("range_id", (F.col("docid") / cfg.range_size).cast("int"))
            .select(*DOC_COLS, "range_id")
        )
        # docids are monotone within each written file (range-sorted
        # upstream), so parquet min/max stats give docid/range pruning for
        # free — no partitionBy needed (it would explode file count:
        # tasks x ranges commits serially on the driver)
        self.cat.write(docs, "docs")
        docs.unpersist()  # release the with_dense_ids persist
        stored = self.cat.read(self.spark, "docs")
        row = stored.agg(
            F.count("*").alias("n"),
            F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("total"),
        ).collect()[0]
        self.cat.write_json(
            "stats.json",
            {
                "n_docs": int(row["n"]),
                "avgdl": float(row["avgdl"] or 0.0),
                "total_tokens": int(row["total"] or 0),
                "k1": self.cfg.k1,
                "b": self.cfg.b,
                "analyzer": self.cfg.analyzer,
                "block_size": self.cfg.block_size,
                "range_size": self.cfg.range_size,
                "n_term_buckets": self.cfg.n_term_buckets,
                "build_id": mf.build_id,
            },
        )
        mf.mark_done("docs", {"n_docs": int(row["n"]), "total_tokens": int(row["total"] or 0)})

    # ------------------------------------------------------------------
    def _bucket_groups(self) -> list[list[int]]:
        g = max(1, self.cfg.build_groups)
        return [
            [b for b in range(self.cfg.n_term_buckets) if b % g == i]
            for i in range(g)
        ]

    def _stage_postings(self, mf: BuildManifest, unit: str, buckets: list[int], stats: dict) -> None:
        cfg = self.cfg
        sc = self.spark.sparkContext
        acc = {
            "postings_emitted": sc.accumulator(0),
            "blocks_built": sc.accumulator(0),
            "bytes_postings": sc.accumulator(0),
            "bytes_positions": sc.accumulator(0),
        }
        n_shuffle = cfg.build_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions")
        )
        # the docs read yields few, large parquet splits; the tokenizer is
        # the CPU-heavy step and pipelines into the exchange write, so it
        # would otherwise run at the file-split width — spread it first
        docs = self.cat.read(self.spark, "docs").repartition(n_shuffle)
        tok = (
            docs.select(
                "docid",
                "dl",
                F.explode(tokens_col(F.col("text"), cfg.analyzer, "index")).alias("t"),
            )
            .select(
                F.col("t.term").alias("term"),
                F.col("docid"),
                F.col("t.pos").alias("pos"),
                F.col("dl"),
            )
        )
        if len(buckets) < cfg.n_term_buckets:
            tok = tok.filter(
                term_bucket_col(F.col("term"), cfg.n_term_buckets).isin(buckets)
            )
        # SALTED shuffle: key is (term, range_id) so one head term fans out
        # over n_docs/range_size reducers instead of one (north rule).
        salted = (
            tok.withColumn(
                "range_id", (F.col("docid") / cfg.range_size).cast("int")
            )
            .repartition(n_shuffle, "term", "range_id")
            .sortWithinPartitions("term", "docid", "pos")
        )
        builder = make_block_builder(
            cfg.k1, cfg.b, stats["avgdl"], cfg.block_size, cfg.range_size, acc
        )
        blocks = salted.drop("range_id").mapInPandas(builder, BLOCK_SCHEMA)
        blocks = blocks.withColumn(
            "bucket", term_bucket_col(F.col("term"), cfg.n_term_buckets)
        )
        # coalesce blocks toward their bucket before the partitioned
        # write: blocks are ~100x smaller than the token stream so the
        # extra shuffle is cheap, and it bounds files-per-bucket.
        # A plain repartition("bucket") stragglers on head-term buckets
        # (Zipf: one bucket holds far more block bytes) — add a 4-way
        # sub-bucket salt so the write stage drains evenly; files per
        # bucket stay <= 4.
        blocks = blocks.repartition(
            max(1, 4 * len(buckets)),
            "bucket",
            F.pmod(F.col("range_id"), F.lit(4)),
        ).sortWithinPartitions("term", "range_id", "block_id")
        with _conf(self.spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
            self.cat.write(blocks, "postings", partition_by=["bucket"], mode="overwrite")
        mf.mark_done(
            unit,
            {
                "postings_emitted": acc["postings_emitted"].value,
                "blocks_built": acc["blocks_built"].value,
                "bytes_postings": acc["bytes_postings"].value,
                "bytes_positions": acc["bytes_positions"].value,
            },
        )

    # ------------------------------------------------------------------
    def _stage_dictionary(self, mf: BuildManifest) -> None:
        n_terms, fan_in = build_dictionary(self.spark, self.cat, self.cfg)
        stats = self.cat.read_json("stats.json")
        stats["n_terms"] = n_terms
        self.cat.write_json("stats.json", stats)
        mf.mark_done(
            "dictionary", {"n_terms": n_terms, "merge_fan_in": fan_in}
        )


def build_dictionary(spark: SparkSession, cat: IndexCatalog, cfg: EngineConfig) -> tuple[int, int]:
    """Derive the term dictionary from postings blocks: df/cf/max_tfnorm
    per term + dense sorted term ids; bucket-partitioned, term-sorted
    files so parquet min/max stats prune prefix range scans (dtrie/twid
    analog, SURVEY.md §2.3). Also used by streaming compaction."""
    posts = cat.read(spark, "postings")
    terms = posts.groupBy("term").agg(
        F.sum("n_docs").alias("df"),
        F.sum("sum_tf").alias("cf"),
        F.max("max_tfnorm").alias("max_tfnorm"),
        F.count("*").alias("n_blocks"),
    )
    terms = with_dense_ids(terms, ["term"], "term_id")
    terms = terms.withColumn(
        "bucket", term_bucket_col(F.col("term"), cfg.n_term_buckets)
    )
    cat.write(
        terms.sortWithinPartitions("term"), "dictionary", partition_by=["bucket"]
    )
    terms.unpersist()
    stored = cat.read(spark, "dictionary")
    row = stored.agg(
        F.count("*").alias("n_terms"), F.sum("n_blocks").alias("fan_in")
    ).collect()[0]
    return int(row["n_terms"]), int(row["fan_in"])

class _conf:
    """Temporarily set a Spark conf (restores prior value)."""

    def __init__(self, spark: SparkSession, key: str, value: str):
        self.spark, self.key, self.value = spark, key, value

    def __enter__(self):
        try:
            self.prev = self.spark.conf.get(self.key)
        except Exception:
            self.prev = None
        self.spark.conf.set(self.key, self.value)

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset(self.key)
        else:
            self.spark.conf.set(self.key, self.prev)
