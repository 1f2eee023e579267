"""Incremental index maintenance: streaming adds, CRUD delete/update,
compaction.

The reference serializes add/update/delete through a single-writer job
queue (/root/reference/src/main/index.c:186-248; delete
index.c:1037-1070 -> sindex_delete_document sindex.c:1057-1099; replace
index.c:965-1034). Here the same single-writer invariant maps to
Structured Streaming's exactly-once foreachBatch plus an explicit
maintenance API:

- ADD: each micro-batch of new turns is tokenized and appended as a
  DELTA SEGMENT (same block layout, tagged with the batch id). Queries
  see deltas immediately: SearchEngine._postings_df()/_docs_df() union
  postings_delta/ and docs_delta/ into every scan. NRT caveats (stats
  refreshed at compaction; brand-new terms invisible until the
  dictionary rebuild) are documented on those helpers.
- DELETE: tombstone docids appended to tombstones/ (query-time
  anti-join / numpy mask inside WAND), folded at compaction — the
  Lucene liveDocs pattern.
- UPDATE/REPLACE: delete + add, like the reference.
- COMPACT: folds delta segments AND tombstones into the base in one
  rewrite (segment merge; what an Iceberg MERGE INTO + snapshot expire
  would do on a real lakehouse), then rebuilds the dictionary and
  collection stats. Every (term, range) group's max_tfnorm is recomputed
  under the POST-compaction avgdl — see make_compaction_rewriter for why
  stale block-max values would break WAND's upper-bound contract.

Limitations kept honest:
- docids for streamed turns continue AFTER the base build's max docid in
  arrival order (per-batch rank over (conv_id, turn_idx)); global
  rank-stability across restarts comes from the checkpoint.
- a long-lived SearchEngine must call refresh() after compact()/deletes
  (its df cache and stats snapshot are epoch-keyed at construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marlin_spark.config import EngineConfig
from marlin_spark.functions.analyzers import token_count_col, tokens_col
from marlin_spark.index.blocks import (
    BLOCK_SCHEMA,
    make_block_builder,
    make_compaction_rewriter,
)
from marlin_spark.index.catalog import IndexCatalog, term_bucket_col

_POSTING_COLS = [
    "term", "range_id", "block_id", "first_docid", "last_docid",
    "n_docs", "sum_tf", "max_tfnorm", "postings", "positions", "bucket",
]


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, index_dir: str, config: EngineConfig | None = None):
        self.spark = spark
        self.cat = IndexCatalog(index_dir)
        cfg = config or EngineConfig()
        self.stats = self.cat.read_json("stats.json")
        # restore the index's persisted mapping/analyzer so streamed
        # batches tokenize exactly like the base build — an auto-mapped
        # index (app.py create_index(auto_mapping=True)) would otherwise
        # silently index only the default 'text' field (the reference
        # gates every write on its persisted mapping, mapping.c:537-601)
        self.cfg = cfg.with_(
            k1=self.stats.get("k1", cfg.k1),
            b=self.stats.get("b", cfg.b),
            analyzer=self.stats.get("analyzer", cfg.analyzer),
            n_term_buckets=self.stats.get("n_term_buckets", cfg.n_term_buckets),
            block_size=self.stats.get("block_size", cfg.block_size),
            range_size=self.stats.get("range_size", cfg.range_size),
            indexed_fields=tuple(
                self.stats.get("indexed_fields", cfg.indexed_fields)
            ),
        )

    # ------------------------------------------------------------- add
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: append one delta segment of posting blocks.

        Idempotent per batch_id (streaming retry safety): the delta
        partition dir is overwritten, mirroring the reference's
        one-LMDB-txn-per-batch (si_write_end)."""
        cfg = self.cfg
        base = int(self.stats.get("max_docid", self.stats["n_docs"]))
        capacity = int(self.stats.get("batch_capacity", cfg.batch_capacity))
        n_rows = batch_df.count()
        if n_rows > capacity:
            # fail loudly: a silent overflow would assign docids that
            # collide with the next batch's range
            raise ValueError(
                f"micro-batch {batch_id} has {n_rows} rows > batch_capacity "
                f"{capacity}; raise EngineConfig.batch_capacity (and rebuild "
                "stats.json) or split the batch"
            )
        offset = base + int(batch_id) * capacity
        w_cols = ["conv_id", "turn_idx"]
        # per-batch deterministic docids after the base corpus
        from pyspark.sql import Window

        w = Window.orderBy(*w_cols)
        dl_col = None
        for fname in cfg.indexed_fields:
            s = F.when(F.col(fname).isNull(), F.lit(0)).otherwise(
                token_count_col(F.col(fname), cfg.analyzer, "index")
            )
            dl_col = s if dl_col is None else dl_col + s
        docs = (
            batch_df.withColumn(
                "docid", (F.row_number().over(w) + offset).cast("long")
            )
            .withColumn("dl", dl_col)
        )
        # positions packed (field_priority << 16) | pos, like the build
        tok_parts = []
        for prio, fname in enumerate(cfg.indexed_fields):
            t = docs.select(
                "docid",
                "dl",
                F.explode(tokens_col(F.col(fname), cfg.analyzer, "index")).alias("t"),
            ).select(
                F.col("t.term").alias("term"),
                "docid",
                (F.col("t.pos") + F.lit(prio << 16)).alias("pos"),
                "dl",
            )
            tok_parts.append(t)
        tok = tok_parts[0]
        for t in tok_parts[1:]:
            tok = tok.unionByName(t)
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
        # carry EVERY source column (not just the default transcript
        # schema): _docs_df() selects the base docs schema from deltas,
        # so an auto-mapped index with extra stored fields must find
        # them here too (mirrors build.py's `keep` columns)
        keep = [c for c in docs.columns if c not in ("dl", "range_id", "docid")]
        docs.select("docid", *keep, "dl").write.mode("overwrite").parquet(
            self.cat.path(f"docs_delta/batch={batch_id}")
        )

    # ------------------------------------------------------------------
    def start(self, stream_df: DataFrame, checkpoint: str):
        """Attach to a streaming DataFrame of transcript turns."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # ---------------------------------------------------------- delete
    def delete_docids(self, docids) -> None:
        """Tombstone docids (reference: index_delete_document_callback,
        /root/reference/src/main/index.c:1037-1070). Queries constructed
        by a SearchEngine built (or refresh()ed) after this call exclude
        them; compact() folds them out of docs/ and postings/."""
        if isinstance(docids, DataFrame):
            df = docids.select(F.col(docids.columns[0]).cast("long").alias("docid"))
        else:
            df = self.spark.createDataFrame(
                [(int(d),) for d in docids], "docid long"
            )
        df.write.mode("append").parquet(self.cat.path("tombstones"))

    def delete_turns(self, keys) -> None:
        """Delete by natural key (conv_id, turn_idx) — the reference's
        external-id delete (sindex.c:1057-1099 via the id mapping).
        Resolves docids over base + uncompacted delta docs."""
        if not isinstance(keys, DataFrame):
            keys = self.spark.createDataFrame(
                [(str(c), int(t)) for c, t in keys], "conv_id string, turn_idx long"
            )
        keys = keys.select(
            F.col("conv_id").cast("string").alias("conv_id"),
            F.col("turn_idx").cast("long").alias("turn_idx"),
        )
        docs = self._all_docs().select(
            "docid",
            F.col("conv_id").cast("string").alias("conv_id"),
            F.col("turn_idx").cast("long").alias("turn_idx"),
        )
        ids = docs.join(F.broadcast(keys), ["conv_id", "turn_idx"], "left_semi")
        self.delete_docids(ids.select("docid"))

    def update_turns(self, batch_df: DataFrame, batch_id: int) -> None:
        """Replace turns by natural key: delete + add, exactly the
        reference's replace path (index.c:965-1034)."""
        self.delete_turns(batch_df.select("conv_id", "turn_idx"))
        self.process_batch(batch_df, batch_id)

    PATCHABLE_FIELDS = ("role", "text", "tool", "ts")

    def patch_turns(self, patch_df: DataFrame, batch_id: int) -> None:
        """PATCH-style partial update (reference: index.c:965-1034 —
        PATCH merges the request's fields into the stored document before
        reindexing, unlike PUT/replace). DataFrame granularity is the
        COLUMN: every non-key column present in ``patch_df`` replaces the
        stored value (nulls included); absent columns survive unchanged.
        Keys whose stored turn is deleted or unknown are ignored, like
        the reference's per-doc existence check."""
        keys = ["conv_id", "turn_idx"]
        patch_cols = [c for c in patch_df.columns if c not in keys]
        unknown = set(patch_cols) - set(self.PATCHABLE_FIELDS)
        if unknown or not patch_cols:
            raise ValueError(
                f"patch_turns: patchable fields are {self.PATCHABLE_FIELDS},"
                f" got {sorted(patch_cols)}"
            )
        cur = self._all_docs().select(
            "docid",
            F.col("conv_id").cast("string").alias("conv_id"),
            F.col("turn_idx").cast("long").alias("turn_idx"),
            *self.PATCHABLE_FIELDS,
        )
        tomb = self._tombstones()
        if tomb is not None:
            tdf = self.spark.createDataFrame(
                [(int(d),) for d in tomb], "docid long"
            )
            cur = cur.join(F.broadcast(tdf), "docid", "left_anti")
        p = patch_df.select(
            F.col("conv_id").cast("string").alias("conv_id"),
            F.col("turn_idx").cast("long").alias("turn_idx"),
            *[F.col(c).alias(f"_p_{c}") for c in patch_cols],
        )
        merged = cur.join(F.broadcast(p), keys, "inner").select(
            *keys,
            *[
                (F.col(f"_p_{c}") if c in patch_cols else F.col(c)).alias(c)
                for c in self.PATCHABLE_FIELDS
            ],
        )
        self.update_turns(merged, batch_id)

    # ------------------------------------------------------------------
    def _all_docs(self) -> DataFrame:
        base = self.cat.read(self.spark, "docs")
        deltas = self.cat.committed_delta_dirs("docs")
        if deltas:
            dd = self.spark.read.parquet(*deltas).withColumn(
                "range_id", (F.col("docid") / self.cfg.range_size).cast("int")
            )
            base = base.unionByName(
                dd.select(
                    *[
                        F.col(f.name).cast(f.dataType).alias(f.name)
                        for f in base.schema.fields
                    ]
                )
            )
        return base

    def _tombstones(self):
        """Sorted int64 tombstone array, or None."""
        import numpy as np

        if not self.cat.exists("tombstones"):
            return None
        import pyarrow.dataset as pads

        arr = np.unique(
            pads.dataset(self.cat.path("tombstones"), format="parquet")
            .to_table(columns=["docid"])["docid"]
            .to_numpy()
        ).astype(np.int64)
        return arr if arr.size else None

    # ------------------------------------------------------------------
    def compact(self) -> None:
        """Fold delta segments + tombstones into the base and refresh
        dictionary/stats (segment merge; Iceberg MERGE INTO analog).

        Visibility protocol: the merged docs AND postings are staged in
        ``<table>__snap<N>`` dirs, then made live together by ONE atomic
        snapshot commit (catalog.commit_snapshot: version-hint rename) —
        a crash anywhere before that leaves the previous snapshot fully
        intact; superseded dirs are expired afterwards.

        Honesty note (scale): _tombstones() materializes the delete set
        on the driver for the rewriter closure — compaction of a >1e8
        tombstone backlog should stream the set instead (the query-side
        distributed gate in engine._not_deleted has no compaction twin
        yet)."""
        import shutil

        # fold only fully-committed batches; a half-written (crashed)
        # batch dir is left in place for the streaming retry to overwrite
        delta_dirs = self.cat.committed_delta_dirs("postings")
        doc_deltas = self.cat.committed_delta_dirs("docs")
        tomb = self._tombstones()
        if not delta_dirs and not doc_deltas and tomb is None:
            return
        snap = self.cat.current_snapshot()
        next_id = (snap["snapshot_id"] + 1) if snap else 1
        docs_new = f"docs__snap{next_id}"
        postings_new = f"postings__snap{next_id}"

        # ---- 1. docs: base + deltas - tombstones -> staged docs dir
        docs = self.cat.read(self.spark, "docs")
        base_schema = docs.schema
        if doc_deltas:
            dd = self.spark.read.parquet(*doc_deltas).withColumn(
                "range_id", (F.col("docid") / self.cfg.range_size).cast("int")
            )
            # delta columns must match the base EXACTLY (set, order AND
            # types: mixed int32/int64 parquet files fail on read)
            dd = dd.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in base_schema.fields
                ]
            )
            docs = docs.unionByName(dd)
        if tomb is not None:
            tomb_df = self.spark.createDataFrame(
                [(int(d),) for d in tomb], "docid long"
            )
            docs = docs.join(F.broadcast(tomb_df), "docid", "left_anti")
        rg_bytes = str(self.cfg.docs_row_group_mb * 1024 * 1024)
        self.cat.write(docs, docs_new, options={"parquet.block.size": rg_bytes})

        # ---- 2. collection stats FIRST: the postings rewrite recomputes
        # block-max tfnorm under the post-compaction avgdl (read the
        # STAGED dir — not yet committed/visible)
        row = self.spark.read.parquet(self.cat.raw_path(docs_new)).agg(
            F.count("*").alias("n"),
            F.avg("dl").alias("avgdl"),
            F.max("docid").alias("mx"),
        ).collect()[0]
        new_avgdl = float(row["avgdl"] or 0.0)

        # ---- 3. postings: base + deltas -> group-merge/tombstone/rewrite
        base = self.cat.read(self.spark, "postings")
        if "rgroup" in base.columns:  # build-time resume-group dirs
            base = base.drop("rgroup")
        merged = base.select(*_POSTING_COLS)
        if delta_dirs:
            deltas = self.spark.read.parquet(*delta_dirs).select(*_POSTING_COLS)
            merged = merged.unionByName(deltas)
        rewriter = make_compaction_rewriter(
            self.cfg.k1, self.cfg.b, new_avgdl, self.cfg.block_size, tomb
        )
        n_part = max(1, 4 * self.cfg.n_term_buckets)
        rewritten = (
            merged.repartition(
                n_part, "bucket", F.pmod(F.col("range_id"), F.lit(4))
            )
            .mapInPandas(rewriter, BLOCK_SCHEMA)
            .withColumn(
                "bucket", term_bucket_col(F.col("term"), self.cfg.n_term_buckets)
            )
            .sortWithinPartitions("term", "range_id", "block_id")
        )
        self.cat.write(
            rewritten, postings_new, partition_by=["bucket"], mode="overwrite"
        )
        # ---- COMMIT: docs + postings swap visibility in one atomic
        # version-hint rename (multi-table transaction); crash before
        # this line leaves the old snapshot fully live
        self.cat.commit_snapshot(
            {"docs": docs_new, "postings": postings_new},
            summary={
                "operation": "compact",
                "folded_batches": len(delta_dirs),
                "tombstones": 0 if tomb is None else int(tomb.size),
                "n_docs": int(row["n"]),
            },
        )
        self.cat.expire_superseded()
        # Spark caches file listings per path for the whole session; the
        # resolved table paths MUST be refreshed or later reads in this
        # session silently see stale listings
        self.spark.catalog.refreshByPath(self.cat.path("docs"))
        self.spark.catalog.refreshByPath(self.cat.path("postings"))

        # ---- 4. clear folded inputs
        for d in delta_dirs + doc_deltas:
            shutil.rmtree(d)
        if tomb is not None:
            shutil.rmtree(self.cat.path("tombstones"), ignore_errors=True)

        # ---- 5. refresh the dictionary (df/cf/term ids over merged
        # postings) and stats
        from marlin_spark.index.build import build_dictionary

        n_terms, _ = build_dictionary(self.spark, self.cat, self.cfg)
        if self.cat.exists("prefix_accel"):
            # fold the merged segments into the short-prefix accelerator
            # (same rebuild-on-commit contract as the dictionary)
            from marlin_spark.index.prefix_accel import build_prefix_accel

            build_prefix_accel(
                self.spark,
                self.cat,
                self.cfg.with_(
                    prefix_accel_len=int(
                        self.stats.get(
                            "prefix_accel_len", self.cfg.prefix_accel_len
                        )
                    )
                ),
            )
            self.spark.catalog.refreshByPath(self.cat.path("prefix_accel"))
        self.stats.update(
            n_docs=int(row["n"]),
            avgdl=new_avgdl,
            max_docid=int(row["mx"] or 0),
            n_terms=n_terms,
            stats_epoch=self.stats.get("stats_epoch", 0) + 1,
        )
        self.cat.write_json("stats.json", self.stats)
