"""Index storage layout ("Iceberg-like" local catalog).

Layout under one index directory (the reference keeps everything in LMDB
databases + an mmap'd trie under one index dir — src/main/sindex.c,
src/main/dtrie.c; we keep partitioned Parquet tables + JSON metadata):

    <index_dir>/
      docs/range_id=NN/         docid conv_id turn_idx role tool ts text dl
      postings/bucket=NN/       term range_id block_id first/last_docid
                                n_docs sum_tf max_tfnorm postings positions
      dictionary/fc=c/          term term_id df cf max_tfnorm
                                (fc = first-char class: partition pruning
                                for prefix + fuzzy scans, query/fuzzy.py)
      prefix_accel/fc=c/        prefix range_id postings  (optional:
                                precomputed short-prefix docid blocks,
                                dtrie short-prefix bitmap analog)
      stats.json                n_docs avgdl total_tokens n_terms build_id
      manifest/                 per-stage/per-group checkpoint records
      counters.json             build counters (postings, bytes, fan-in)

The production target is Iceberg (`df.writeTo(tbl).using("iceberg")`,
partitioned by the same columns; atomic snapshot commits replace the
manifest's _done markers). No Iceberg runtime ships in this sandbox, so
the catalog writes partitioned Parquet with explicit JSON metadata — the
build/query code only talks to this module, keeping the swap localized.

Term bucketing uses crc32(term) % n_buckets: computable identically in
the JVM (F.crc32) and in driver-side Python (zlib.crc32) so the query
planner prunes partitions without a Spark round-trip.
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def term_bucket_col(term: Column, n_buckets: int) -> Column:
    return (F.crc32(term.cast("string")) % n_buckets).cast("int")


def term_bucket_py(term: str, n_buckets: int) -> int:
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_fc_col(term: Column) -> Column:
    """JVM twin of query.fuzzy.term_fc_py (first-char class): terms with
    any char outside [a-z0-9_] -> 'oth'; digit first chars -> 'dN' and
    '_' -> 'us' so hive partition values never type-infer numeric."""
    c1 = F.substring(term, 1, 1)
    return (
        F.when(~term.rlike("^[a-z0-9_]+$"), F.lit("oth"))
        .when(c1.rlike("^[0-9]$"), F.concat(F.lit("d"), c1))
        .when(c1 == "_", F.lit("us"))
        .otherwise(c1)
    )


class IndexCatalog:
    def __init__(self, index_dir: str):
        self.dir = index_dir

    def path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    # --- tables ---
    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None,
              mode: str = "overwrite", options: dict | None = None) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        for k, v in (options or {}).items():
            w = w.option(k, v)
        w.parquet(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def exists(self, name: str) -> bool:
        return os.path.exists(self.path(name))

    def dir_bytes(self, name: str) -> int:
        """Total bytes under a table dir (drives adaptive scan-split
        sizing; an Iceberg catalog exposes the same via table stats)."""
        total = 0
        for root, _dirs, files in os.walk(self.path(name)):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total

    def committed_delta_dirs(self, name: str) -> list[str]:
        """Streaming delta dirs of ``name`` whose batch is FULLY
        committed: a batch becomes visible only when BOTH its
        postings_delta and docs_delta writes finished (_SUCCESS on each)
        — a micro-batch that crashed between the two writes must never
        expose ghost postings (hits with no doc) or ghost docs; the
        streaming retry overwrites the same batch dir idempotently."""
        import glob

        out = []
        for d in sorted(glob.glob(self.path(f"{name}_delta/batch=*"))):
            bid = d.rsplit("=", 1)[1]
            if all(
                os.path.exists(self.path(f"{t}_delta/batch={bid}/_SUCCESS"))
                for t in ("postings", "docs")
            ):
                out.append(d)
        return out

    # --- json metadata ---
    def write_json(self, name: str, obj: dict) -> None:
        os.makedirs(self.dir, exist_ok=True)
        tmp = self.path(name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1, default=str)
        os.replace(tmp, self.path(name))  # atomic, Iceberg-commit analog

    def read_json(self, name: str) -> dict:
        with open(self.path(name)) as f:
            return json.load(f)

    def has_json(self, name: str) -> bool:
        return os.path.exists(self.path(name))
