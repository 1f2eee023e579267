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
    """Local table catalog with an Iceberg-style snapshot log.

    Table locations are indirected through ``metadata/``:

        metadata/v<N>.metadata.json   immutable snapshot: {snapshot_id,
                                      parent, tables: {logical -> dir},
                                      summary}; created with O_EXCL so a
                                      concurrent committer of the same
                                      version fails loudly (optimistic
                                      concurrency, the Iceberg contract)
        metadata/version-hint.text    current snapshot id; REPLACED with
                                      os.replace (atomic POSIX rename) —
                                      this rename IS the commit, exactly
                                      Iceberg's HadoopCatalog protocol

    A fresh build has no metadata/ and every logical name maps to its
    plain directory; compaction stages new ``<table>__snap<N>`` dirs and
    swaps BOTH docs and postings visible in ONE commit (the multi-table
    transaction the streaming dual-_SUCCESS gate approximates). A crash
    before the hint rename leaves the old snapshot live and the staged
    dirs orphaned — never a half-swapped index. Superseded data dirs are
    expired after commit (expire_superseded); metadata history is kept.
    """

    def __init__(self, index_dir: str):
        self.dir = index_dir
        self._snap = None
        self._snap_loaded = False

    # --- snapshot log ---
    def _meta(self, *parts: str) -> str:
        return os.path.join(self.dir, "metadata", *parts)

    def current_snapshot(self) -> dict | None:
        if not self._snap_loaded:
            self._snap = None
            try:
                with open(self._meta("version-hint.text")) as f:
                    n = int(f.read().strip())
                with open(self._meta(f"v{n}.metadata.json")) as f:
                    self._snap = json.load(f)
            except (FileNotFoundError, ValueError):
                pass
            self._snap_loaded = True
        return self._snap

    def reload_snapshot(self) -> None:
        """Re-read the snapshot pointer (SearchEngine.refresh calls this
        so a compact() done by another process becomes visible)."""
        self._snap_loaded = False

    def commit_snapshot(self, tables: dict, summary: dict | None = None) -> int:
        cur = self.current_snapshot()
        mapping = dict(cur["tables"]) if cur else {}
        mapping.update(tables)
        n = (cur["snapshot_id"] + 1) if cur else 1
        os.makedirs(self._meta(), exist_ok=True)
        meta = {
            "snapshot_id": n,
            "parent": cur["snapshot_id"] if cur else None,
            "tables": mapping,
            "summary": summary or {},
        }
        # immutable + exclusive: a racing writer of v<n> fails here
        with open(self._meta(f"v{n}.metadata.json"), "x") as f:
            json.dump(meta, f, indent=1, default=str)
        tmp = self._meta("version-hint.tmp")
        with open(tmp, "w") as f:
            f.write(str(n))
        os.replace(tmp, self._meta("version-hint.text"))  # THE commit
        self._snap_loaded = False
        return n

    def expire_superseded(self, retain_last: int = 1) -> None:
        """Remove data dirs no longer referenced by the ``retain_last``
        most recent snapshots (snapshot-expire analog; run post-commit,
        failures harmless). retain_last=1 is aggressive single-snapshot
        retention — in-flight readers of older files fail, like the
        pre-snapshot rmtree swap did; retain_last>=2 gives concurrent
        readers holding snapshot N a full grace window while the writer
        commits N+1 (Iceberg's expire_snapshots(retain_last) contract,
        tested in test_iceberg_spec.py::test_concurrent_reader_survives_
        commit_and_expire)."""
        import shutil as _sh

        snap = self.current_snapshot()
        if not snap:
            return
        live = set(snap["tables"].values())
        n = snap["snapshot_id"]
        for k in range(max(1, n - retain_last + 1), n):
            try:
                with open(self._meta(f"v{k}.metadata.json")) as f:
                    live |= set(json.load(f)["tables"].values())
            except (FileNotFoundError, ValueError):
                pass
        for logical, mapped in snap["tables"].items():
            for cand in [logical] + [
                d
                for d in os.listdir(self.dir)
                if d.startswith(logical + "__snap")
            ]:
                if cand not in live and os.path.isdir(os.path.join(self.dir, cand)):
                    _sh.rmtree(os.path.join(self.dir, cand), ignore_errors=True)

    def clear_snapshots(self) -> None:
        """Drop the snapshot log (full rebuild = new table history)."""
        import shutil as _sh

        _sh.rmtree(self._meta(), ignore_errors=True)
        self._snap_loaded = False

    def path(self, name: str) -> str:
        """Location of a logical table (snapshot-resolved); subpaths
        (e.g. 'dictionary/fc=a') resolve their head component."""
        snap = self.current_snapshot()
        if snap:
            head, sep, rest = name.partition("/")
            mapped = snap["tables"].get(head)
            if mapped is not None:
                return os.path.join(self.dir, mapped + sep + rest)
        return os.path.join(self.dir, name)

    def raw_path(self, name: str) -> str:
        """Physical location ignoring the snapshot indirection (staging
        writes before a commit)."""
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
        if partition_by and not self.has_part_files(name):
            # A partitioned write of ZERO rows leaves only _SUCCESS — a
            # directory Spark cannot re-read (UNABLE_TO_INFER_SCHEMA).
            # Keep empty tables readable (empty corpus build / clear):
            # one schema-only footer file, partition columns kept as
            # ordinary columns so the read-back schema is unchanged.
            df.limit(0).repartition(1).write.mode("overwrite").parquet(
                self.path(name)
            )

    def has_part_files(self, name: str) -> bool:
        for root, _dirs, files in os.walk(self.path(name)):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

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
