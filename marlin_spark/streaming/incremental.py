"""Incremental index maintenance via Structured Streaming foreachBatch.

The reference has no streaming; its closest analog is the serial
single-writer job queue for add/update/delete
(/root/reference/src/main/index.c:186-248). Here the same single-writer
invariant maps to Structured Streaming's exactly-once foreachBatch: each
micro-batch of new turns is tokenized and appended as a DELTA SEGMENT
(same block layout, tagged with the batch id); queries merge base +
delta postings transparently because blocks are independent rows. A
periodic compaction job (merge_segments) folds deltas back into the base
— the Lucene segment-merge pattern, which is also what an Iceberg
MERGE INTO would do on a real lakehouse.

Limitations kept honest:
- docids for streamed turns continue AFTER the base build's max docid in
  arrival order (per-batch rank over (conv_id, turn_idx)); global
  rank-stability across restarts comes from the checkpoint.
- df/avgdl statistics are refreshed at compaction, not per micro-batch
  (scoring between compactions uses base stats — standard practice;
  noted in stats.json as stats_epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marlin_spark.config import EngineConfig
from marlin_spark.functions.analyzers import tokens_col
from marlin_spark.index.blocks import BLOCK_SCHEMA, make_block_builder
from marlin_spark.index.catalog import IndexCatalog, term_bucket_col


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, index_dir: str, config: EngineConfig | None = None):
        self.spark = spark
        self.cat = IndexCatalog(index_dir)
        self.cfg = config or EngineConfig()
        self.stats = self.cat.read_json("stats.json")

    # ------------------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: append one delta segment of posting blocks.

        Idempotent per batch_id (streaming retry safety): the delta
        partition dir is overwritten, mirroring the reference's
        one-LMDB-txn-per-batch (si_write_end)."""
        cfg = self.cfg
        base = int(self.stats.get("max_docid", self.stats["n_docs"]))
        offset = base + int(batch_id) * int(self.stats.get("batch_capacity", 1_000_000))
        w_cols = ["conv_id", "turn_idx"]
        # per-batch deterministic docids after the base corpus
        from pyspark.sql import Window

        w = Window.orderBy(*w_cols)
        docs = (
            batch_df.withColumn(
                "docid", (F.row_number().over(w) + offset).cast("long")
            )
            .withColumn("_toks", tokens_col(F.col("text"), cfg.analyzer, "index"))
            .withColumn("dl", F.size("_toks"))
        )
        tok = docs.select(
            "docid",
            "dl",
            F.explode("_toks").alias("t"),
        ).select(
            F.col("t.term").alias("term"), "docid", F.col("t.pos").alias("pos"), "dl"
        )
        builder = make_block_builder(
            cfg.k1, cfg.b, self.stats["avgdl"], cfg.block_size, cfg.range_size
        )
        blocks = (
            tok.withColumn("range_id", (F.col("docid") / cfg.range_size).cast("int"))
            .repartition("term", "range_id")
            .sortWithinPartitions("term", "docid", "pos")
            .drop("range_id")
            .mapInPandas(builder, BLOCK_SCHEMA)
            .withColumn("bucket", term_bucket_col(F.col("term"), cfg.n_term_buckets))
        )
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(
            self.cat.path(f"postings_delta/batch={batch_id}")
        )
        docs.select(
            "docid", "conv_id", "turn_idx", "role", "tool", "ts", "text", "dl"
        ).write.mode("overwrite").parquet(self.cat.path(f"docs_delta/batch={batch_id}"))

    # ------------------------------------------------------------------
    def start(self, stream_df: DataFrame, checkpoint: str):
        """Attach to a streaming DataFrame of transcript turns."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # ------------------------------------------------------------------
    def compact(self) -> None:
        """Fold delta segments into base postings + refresh stats
        (segment merge; Iceberg MERGE INTO analog)."""
        import glob
        import shutil

        delta_dirs = sorted(glob.glob(self.cat.path("postings_delta/batch=*")))
        if not delta_dirs:
            return
        base = self.cat.read(self.spark, "postings")
        if "rgroup" in base.columns:  # build-time resume-group partition dirs
            base = base.drop("rgroup")
        deltas = self.spark.read.parquet(*delta_dirs)
        merged = base.unionByName(deltas)
        self.cat.write(
            merged, "postings_merged", partition_by=["bucket"], mode="overwrite"
        )
        # atomic-ish swap (an Iceberg snapshot commit in production)
        shutil.rmtree(self.cat.path("postings"))
        shutil.move(self.cat.path("postings_merged"), self.cat.path("postings"))
        # Spark caches file listings per path for the whole session; the
        # swapped directory MUST be refreshed or later reads (incl. the
        # dictionary rebuild below) silently see the old snapshot
        self.spark.catalog.refreshByPath(self.cat.path("postings"))
        doc_deltas = sorted(glob.glob(self.cat.path("docs_delta/batch=*")))
        if doc_deltas:
            dd = self.spark.read.parquet(*doc_deltas).withColumn(
                "range_id",
                (F.col("docid") / self.cfg.range_size).cast("int"),
            )
            # docs/ is a flat (unpartitioned) layout — the appended delta
            # must match its schema EXACTLY (column set, order, AND types:
            # mixed int32/int64 parquet files fail on read)
            base_schema = self.cat.read(self.spark, "docs").schema
            dd.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in base_schema.fields
                ]
            ).write.mode("append").parquet(self.cat.path("docs"))
            self.spark.catalog.refreshByPath(self.cat.path("docs"))
        for d in delta_dirs + doc_deltas:
            shutil.rmtree(d)
        # refresh the dictionary (df/cf/term ids over merged postings)
        from marlin_spark.index.build import build_dictionary

        n_terms, _ = build_dictionary(self.spark, self.cat, self.cfg)
        # refresh collection stats
        docs = self.cat.read(self.spark, "docs")
        row = docs.agg(
            F.count("*").alias("n"),
            F.avg("dl").alias("avgdl"),
            F.max("docid").alias("mx"),
        ).collect()[0]
        self.stats.update(
            n_docs=int(row["n"]),
            avgdl=float(row["avgdl"]),
            max_docid=int(row["mx"]),
            n_terms=n_terms,
            stats_epoch=self.stats.get("stats_epoch", 0) + 1,
        )
        self.cat.write_json("stats.json", self.stats)
