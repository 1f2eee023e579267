"""Index build pipeline (SURVEY.md §3.2 Spark mapping; north rule core).

Stages, each a resumable manifest unit:

  A "docs"        transcripts -> deterministic docids (dense rank over
                  (conv_id, turn_idx)) -> tokenize (Arrow pandas_udf) ->
                  dl -> write docs/ partitioned by doc range; collection
                  stats (n_docs, avgdl) -> stats.json.
                  [reference analog: sdata_add_documents + doc blob sizes,
                   /root/reference/src/main/sdata.c:162-181, sindex.c:66-97]

  B "postings:rK" per contiguous docid-range group: ZERO-SHUFFLE block
                  build. mapInPandas directly over the docs/ scan
                  (docid, dl, text): each split tokenizes its docs and
                  assembles every (term, range_id) posting group locally
                  (range_id = docid // range_size is a pure function of
                  docid, so a doc slab owns its groups outright) ->
                  delta+varbyte blocks with skip pointers + block-max ->
                  small block coalesce -> postings/rgroup=K/bucket=NN/.
                  The round-1 design shuffled the exploded token stream
                  (~30x the text bytes) by (term, range_id); that exchange
                  was the measured non-scaling component on one box. Now
                  the only exchange in stage B is the compressed blocks
                  (~100x smaller than the tokens). Resume granularity is
                  the docid-range group: its scan is parquet-min/max
                  pruned and its output dir is overwritten idempotently.
                  [reference analog: string_new_word_pos + si_write_end
                   batch flush, /root/reference/src/main/sindex.c:658-726,184-254]

  C "dictionary"  postings -> groupBy(term): df, cf, n_blocks (merge
                  fan-in), global max_tfnorm; dense term_id by sorted term
                  -> dictionary/fc=c/ (first-char-class partitions +
                  sorted-by-term files => partition pruning for prefix and
                  fuzzy scans, parquet min/max stats within).
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
from pyspark.sql.window import Window

from marlin_spark.config import EngineConfig
from marlin_spark.functions.analyzers import token_count_col
from marlin_spark.index.blocks import (
    BLOCK_SCHEMA,
    make_block_merger,
    make_doc_range_builder,
)
from marlin_spark.index.catalog import IndexCatalog, term_bucket_col, term_fc_col
from marlin_spark.index.manifest import BuildManifest
from marlin_spark.operators.docids import with_dense_ids

# stable key columns every corpus must carry; the doc store otherwise
# keeps the SOURCE's own columns (auto-mapped tables are not forced into
# the transcript shape — reference stores the whole JSON doc, sdata.c)
DOC_KEYS = ["conv_id", "turn_idx"]


class IndexBuilder:
    def __init__(self, spark: SparkSession, index_dir: str, config: EngineConfig | None = None):
        self.spark = spark
        self.cfg = config or EngineConfig()
        self.cat = IndexCatalog(index_dir)

    # ------------------------------------------------------------------
    def build(self, transcripts: DataFrame, build_id: str = "build-0", resume: bool = True,
              source_path: str | None = None) -> dict:
        self._transcripts = transcripts
        # opt-in zero-shuffle docid path: set when `transcripts` IS the
        # full unfiltered scan of a range-sorted parquet table at this
        # path (verified from footers; falls back silently otherwise)
        self._source_path = source_path
        mf = BuildManifest(self.cat.dir, build_id)
        t0 = time.time()
        stage_secs = {}
        if not (resume and mf.is_done("docs")):
            # full (re)build starts a fresh table history: without this a
            # rebuild on a compacted index would write INTO the live
            # snapshot dirs through the catalog's path indirection
            self.cat.clear_snapshots()
            self._stage_docs(mf)
        stage_secs["docs"] = round(time.time() - t0, 2)
        # stage A wrote docs/; stats needed by the block builder
        stats = self.cat.read_json("stats.json")

        t1 = time.time()
        groups = self._range_groups(stats["n_docs"])
        for g, (lo, hi) in enumerate(groups):
            unit = f"postings:r{g}"
            if resume and mf.is_done(unit):
                continue
            self._stage_postings(mf, unit, g, lo, hi, len(groups), stats)
        stage_secs["postings"] = round(time.time() - t1, 2)

        t2 = time.time()
        if not (resume and mf.is_done("dictionary")):
            self._stage_dictionary(mf)
        stage_secs["dictionary"] = round(time.time() - t2, 2)

        if self.cfg.prefix_accel:
            t3 = time.time()
            if not (resume and mf.is_done("prefix_accel")):
                from marlin_spark.index.prefix_accel import build_prefix_accel

                info = build_prefix_accel(self.spark, self.cat, self.cfg)
                mf.mark_done("prefix_accel", info)
                s = self.cat.read_json("stats.json")
                s["prefix_accel_len"] = self.cfg.prefix_accel_len
                self.cat.write_json("stats.json", s)
            stage_secs["prefix_accel"] = round(time.time() - t3, 2)

        counters = mf.counters()
        counters["stage_seconds"] = stage_secs
        counters["build_seconds"] = round(time.time() - t0, 3)
        counters["n_docs"] = stats["n_docs"]
        self.cat.write_json("counters.json", counters)
        return counters

    # ------------------------------------------------------------------
    def _stage_docs(self, mf: BuildManifest) -> None:
        cfg = self.cfg
        phases: dict[str, float] = {}
        t = time.time()
        # transcripts arrive as an external DataFrame; builder reads it once
        src = self._transcripts
        docs = None
        if getattr(self, "_source_path", None):
            from marlin_spark.operators.docids import dense_ids_over_sorted_files

            docs = dense_ids_over_sorted_files(
                self.spark, self._source_path, ["conv_id", "turn_idx"], "docid"
            )
        phases["docid_plan"] = round(time.time() - t, 2)
        t = time.time()
        persisted = docs is None
        if docs is None:
            docs = with_dense_ids(src, ["conv_id", "turn_idx"], "docid",
                                  num_partitions=cfg.build_partitions)
        # dl counts tokens across ALL indexed fields (multi-field: the
        # reference walks every indexedFields entry, sindex.c:792-893)
        dl_col = None
        for fname in cfg.indexed_fields:
            s = F.when(F.col(fname).isNull(), F.lit(0)).otherwise(
                token_count_col(F.col(fname), cfg.analyzer, "index")
            )
            dl_col = s if dl_col is None else dl_col + s
        missing = [k for k in DOC_KEYS if k not in src.columns]
        if missing:
            raise ValueError(f"transcripts missing key columns {missing}")
        keep = [c for c in src.columns if c not in ("dl", "range_id", "docid")]
        docs = (
            docs.withColumn("dl", dl_col)
            .withColumn("range_id", (F.col("docid") / cfg.range_size).cast("int"))
            .select("docid", *keep, "dl", "range_id")
        )
        # docids are monotone within each written file (range-sorted
        # upstream), so parquet min/max stats give docid/range pruning for
        # free — no partitionBy needed (it would explode file count:
        # tasks x ranges commits serially on the driver).
        # Small row groups are load-bearing: stage B's zero-shuffle scan
        # parallelizes at row-group granularity (maxPartitionBytes can't
        # split a row group), so the split width of the postings build is
        # set HERE.
        rg_bytes = str(self.cfg.docs_row_group_mb * 1024 * 1024)
        # collection stats ride along on the write job (Observation
        # metrics) — no second read+agg pass over docs/
        from pyspark.sql import Observation

        obs = Observation("docs_stats")
        docs = docs.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("total"),
        )
        phases["plan"] = round(time.time() - t, 2)
        t = time.time()
        self.cat.write(docs, "docs", options={"parquet.block.size": rg_bytes})
        phases["write_job"] = round(time.time() - t, 2)
        t = time.time()
        if persisted:
            docs.unpersist()  # release the with_dense_ids persist
        row = obs.get
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
                "indexed_fields": list(self.cfg.indexed_fields),
                "batch_capacity": self.cfg.batch_capacity,
                "max_docid": int(row["n"]),
                "build_id": mf.build_id,
            },
        )
        phases["stats"] = round(time.time() - t, 2)
        mf.mark_done(
            "docs",
            {"n_docs": int(row["n"]), "total_tokens": int(row["total"] or 0),
             "docs_phases": phases},
        )

    # ------------------------------------------------------------------
    def _range_groups(self, n_docs: int) -> list[tuple[int, int]]:
        """Split docids [1, n_docs] into build_groups contiguous slices
        ALIGNED to range_size boundaries, so a (term, range_id) posting
        group never spans two resume units. Returns inclusive docid
        bounds per group."""
        g = max(1, self.cfg.build_groups)
        rs = self.cfg.range_size
        n_ranges = n_docs // rs + 1
        per = max(1, (n_ranges + g - 1) // g)
        out = []
        for i in range(g):
            lo_r, hi_r = i * per, min((i + 1) * per, n_ranges)
            if lo_r >= hi_r:
                break
            out.append((lo_r * rs, hi_r * rs - 1))
        return out

    def _stage_postings(
        self,
        mf: BuildManifest,
        unit: str,
        gid: int,
        lo: int,
        hi: int,
        n_groups: int,
        stats: dict,
    ) -> None:
        cfg = self.cfg
        sc = self.spark.sparkContext
        acc = {
            "postings_emitted": sc.accumulator(0),
            "blocks_built": sc.accumulator(0),
            "bytes_postings": sc.accumulator(0),
            "bytes_positions": sc.accumulator(0),
        }
        # per-phase wall-ms summed across tasks (scaling diagnostics)
        timing = {
            k: sc.accumulator(0)
            for k in ("ms_read", "ms_tokenize", "ms_flatten", "ms_sort",
                      "ms_emit", "ms_merge", "ms_merge_wait",
                      "cpu_read", "cpu_tokenize", "cpu_flatten", "cpu_sort",
                      "cpu_emit", "cpu_merge")
        }
        fields = list(cfg.indexed_fields)
        docs = self.cat.read(self.spark, "docs").select("docid", "dl", *fields)
        if n_groups > 1:
            # docs files are docid-range-sorted: parquet min/max stats
            # prune this to the group's slab without reading other groups
            docs = docs.filter((F.col("docid") >= lo) & (F.col("docid") <= hi))
        builder = make_doc_range_builder(
            cfg.analyzer, cfg.k1, cfg.b, stats["avgdl"],
            cfg.block_size, cfg.range_size,
            {"postings_emitted": acc["postings_emitted"], **timing},
            fields=fields,
        )
        merger = make_block_merger(
            cfg.k1, cfg.b, stats["avgdl"], cfg.block_size,
            {
                **{k: acc[k] for k in ("blocks_built", "bytes_postings", "bytes_positions")},
                "ms_merge": timing["ms_merge"],
                "ms_merge_wait": timing["ms_merge_wait"],
                "cpu_merge": timing["cpu_merge"],
            },
        )
        # parallelism of the zero-shuffle stage = scan splits; docs/ is
        # written with small row groups (docs_row_group_mb) precisely so
        # this split size is effective. Split size adapts to the data so
        # the stage always runs ~waves_per_core waves of uniform tasks —
        # a fixed split width gave 1.4 waves at 32 cores (30% tail idle)
        # while the 8-core run packed 5.5 waves (9%), which alone sank
        # the measured N->4N efficiency.
        cores = self.spark.sparkContext.defaultParallelism
        docs_bytes = self.cat.dir_bytes("docs") // max(1, n_groups)
        split = min(
            max(docs_bytes // (4 * cores), cfg.docs_row_group_mb * 1024 * 1024),
            16 * 1024 * 1024,
        )
        with _conf(self.spark, "spark.sql.files.maxPartitionBytes", str(split)):
            raw = docs.mapInPandas(builder, BLOCK_SCHEMA)
            raw = raw.withColumn(
                "bucket", term_bucket_col(F.col("term"), cfg.n_term_buckets)
            )
            # coalesce blocks toward their bucket AND fold split-boundary
            # partial blocks in the same (cheap — blocks are ~100x smaller
            # than the token stream) shuffle: the key (bucket, range%S)
            # co-locates every block of a (term, range) group, so the
            # merger re-cuts them into the blocks a single-pass build
            # would emit. The S-way sub-bucket salt spreads Zipf-head
            # buckets across reducers: S=16 gives 16*n_term_buckets keys
            # over ~4 partitions/core, so no single reducer straggles the
            # merge wave.
            blocks = raw.repartition(
                max(16, 4 * cores),
                "bucket",
                F.pmod(F.col("range_id"), F.lit(16)),
            ).mapInPandas(merger, BLOCK_SCHEMA + ", bucket int")
            blocks = blocks.sortWithinPartitions("term", "range_id", "block_id")
            # each group owns its rgroup=K dir: a retried group overwrites
            # idempotently, completed groups are untouched (read-side hive
            # discovery exposes rgroup as a partition column, harmless)
            blocks.write.mode("overwrite").partitionBy("bucket").parquet(
                self.cat.path(f"postings/rgroup={gid}")
            )
            if not self.cat.has_part_files(f"postings/rgroup={gid}"):
                # zero postings in this group (empty corpus / clear):
                # leave a schema-only footer so the table stays readable
                # (limit(0) constant-folds — no re-execution of the UDFs)
                blocks.limit(0).repartition(1).write.mode(
                    "overwrite"
                ).parquet(self.cat.path(f"postings/rgroup={gid}"))
        mf.mark_done(
            unit,
            {
                "postings_emitted": acc["postings_emitted"].value,
                "blocks_built": acc["blocks_built"].value,
                "bytes_postings": acc["bytes_postings"].value,
                "bytes_positions": acc["bytes_positions"].value,
                **{k: v.value for k, v in timing.items()},
            },
        )

    # ------------------------------------------------------------------
    def _stage_dictionary(self, mf: BuildManifest) -> None:
        n_terms, fan_in = build_dictionary(
            self.spark, self.cat, self.cfg,
            # every postings block is one term's block within a (bucket,
            # range) group, so blocks_built bounds the vocabulary size —
            # lets the dictionary pick its single-partition fast path
            n_blocks_hint=mf.counters().get("blocks_built"),
        )
        stats = self.cat.read_json("stats.json")
        stats["n_terms"] = n_terms
        self.cat.write_json("stats.json", stats)
        mf.mark_done(
            "dictionary", {"n_terms": n_terms, "merge_fan_in": fan_in}
        )


# Vocabularies at or below this are sorted and id-assigned ON THE DRIVER
# (planner-side bounded collect, ~100 B/term -> <=50 MB): after the one
# postings scan that computes the per-term aggregates, every distributed
# dense-id scheme (single-partition window, or with_dense_ids' range
# sample + counts + offset join) only adds jobs whose wall clock is pure
# fixed cost — measured 5.8 s FLAT at both 2 and 8 cores on the 3.4M-turn
# corpus (stage scaling efficiency 0.27, the single largest cap on the
# build's N->4N efficiency in the round-4 standalone detail). Above the
# bound the distributed two-pass runs, with the aggregated terms frame
# persisted so the range sampler does not re-scan postings.
_DICT_DRIVER_MAX = 500_000


def build_dictionary(
    spark: SparkSession,
    cat: IndexCatalog,
    cfg: EngineConfig,
    n_blocks_hint: int | None = None,
) -> tuple[int, int]:
    """Derive the term dictionary from postings blocks: df/cf/max_tfnorm
    per term + dense sorted term ids; partitioned by first-char class
    (fc) with term-sorted files, so exact lookups, prefix range scans AND
    fuzzy expansion all prune at the partition level first and by parquet
    min/max stats second (dtrie/twid analog, SURVEY.md §2.3 +
    query/fuzzy.py). Also used by streaming compaction.

    The stage scans postings exactly once (persist + count), then picks
    the id-assignment path from the TRUE vocabulary size (the old
    ``n_blocks_hint`` upper bound overshot by >100x on Zipf corpora,
    forcing distributed machinery onto kilobyte vocabularies): at or
    below _DICT_DRIVER_MAX the sorted dense ids are assigned on the
    driver from the cached aggregates — one scan job plus one small
    write job, nothing serial on an executor; above it with_dense_ids
    runs over the persisted frame (sampling, counts and offset join all
    read cache, never postings)."""
    from pyspark.storagelevel import StorageLevel

    posts = cat.read(spark, "postings")
    terms = posts.groupBy("term").agg(
        F.sum("n_docs").alias("df"),
        F.sum("sum_tf").alias("cf"),
        F.max("max_tfnorm").alias("max_tfnorm"),
        F.count("*").alias("n_blocks"),
        # top-16 block maxes: each is the EXACT max core of a distinct
        # doc (blocks are disjoint), so top_maxes[k-1] * idf is a valid
        # global lower bound on a query's final k-th best score — the
        # batched-WAND theta seed (engine._theta_seeds) reads it straight
        # off the dictionary lookup instead of scanning postings metadata
        F.slice(
            F.sort_array(F.collect_list("max_tfnorm"), asc=False), 1, 16
        ).alias("top_maxes"),
    )
    cached = terms.persist(StorageLevel.MEMORY_AND_DISK)
    n_terms = cached.count()  # the one postings scan; fills the cache
    if n_terms <= _DICT_DRIVER_MAX:
        rows = [r.asDict() for r in cached.collect()]  # cache hit, tiny
        rows.sort(key=lambda r: r["term"])
        fan_in = 0
        for i, r in enumerate(rows):
            r["term_id"] = i + 1
            fan_in += r["n_blocks"]
        out = spark.createDataFrame(
            rows,
            "term string, df long, cf long, max_tfnorm double, "
            "n_blocks long, top_maxes array<double>, term_id long",
        ).select("term", "df", "cf", "max_tfnorm", "n_blocks",
                 "top_maxes", "term_id")
    else:
        out = with_dense_ids(cached, ["term"], "term_id")
        fan_in = None
    out = out.withColumn("fc", term_fc_col(F.col("term")))
    if fan_in is None:
        from pyspark.sql import Observation

        obs = Observation("dictionary_stats")
        out = out.observe(obs, F.sum("n_blocks").alias("fan_in"))
        cat.write(
            out.sortWithinPartitions("term"), "dictionary",
            partition_by=["fc"],
        )
        fan_in = int(obs.get["fan_in"] or 0)
    else:
        cat.write(
            out.sortWithinPartitions("term"), "dictionary",
            partition_by=["fc"],
        )
    cached.unpersist()
    return int(n_terms), int(fan_in)

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
