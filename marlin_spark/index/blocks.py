"""Posting-block builders (mapInPandas kernels of the index build).

Two build paths share one block emitter:

- make_doc_range_builder — the MAIN build path (zero-shuffle): runs
  directly over the docs/ scan (docid, dl, text); each scan split
  tokenizes its docs and assembles its (term, range_id) posting groups
  locally, so the exploded token stream never touches the exchange.
  Groups cut by split boundaries yield PARTIAL blocks; the block-merge
  pass below folds them during the (already required) bucket-coalesce
  shuffle of the ~100x-smaller compressed blocks.
- make_block_builder — the token-shuffle path kept for streaming delta
  segments: input partitions of (term, docid, pos, dl) rows sorted by
  (term, range_id, docid, pos) where the shuffle key was (term, range_id).

Each (term, range) group is cut into blocks of <= block_size docs (never
crossing the range boundary — the roaring-container echo,
/root/reference/src/main/cont.h:8-14), delta+varbyte-compressed, and
emitted with skip-pointer metadata (first/last docid) + block-max BM25
tf-norm (multiplied by idf at query time to give the block-max WAND
upper bound).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from marlin_spark.functions.codec import decode_block, decode_positions, encode_block

BLOCK_SCHEMA = (
    "term string, range_id int, block_id int, first_docid long, "
    "last_docid long, n_docs int, sum_tf long, max_tfnorm double, "
    "postings binary, positions binary"
)

_OUT_COLS = [
    "term", "range_id", "block_id", "first_docid", "last_docid",
    "n_docs", "sum_tf", "max_tfnorm", "postings", "positions",
]


def _make_emitter(
    k1: float, b: float, avgdl: float, block_size: int, acc: dict
) -> Callable:
    """Doc-level (term, range) group -> block rows. ``acc`` keys are
    optional so build and merge passes can count disjoint metrics."""

    norm_c = k1 * (1.0 - b)
    norm_s = k1 * b / avgdl if avgdl > 0 else 0.0

    def emit(
        term: str,
        range_id: int,
        u_docids: np.ndarray,
        tfs: np.ndarray,
        u_dls: np.ndarray,
        poss: np.ndarray,
        out: list,
    ) -> None:
        """u_docids strictly increasing; poss doc-major (tfs[i] positions
        for doc i)."""
        n = u_docids.shape[0]
        pos_bounds = np.concatenate(
            ([0], np.cumsum(tfs.astype(np.int64)))
        )
        for blk, s in enumerate(range(0, n, block_size)):
            e = min(s + block_size, n)
            d = u_docids[s:e].astype(np.uint64)
            t = tfs[s:e].astype(np.uint64)
            l = u_dls[s:e].astype(np.uint64)
            p = poss[pos_bounds[s]:pos_bounds[e]].astype(np.int64)
            pb, xb = encode_block(d, t, l, p)
            tfn = t.astype(np.float64)
            score_core = tfn * (k1 + 1.0) / (tfn + norm_c + norm_s * l.astype(np.float64))
            if "blocks_built" in acc:
                acc["blocks_built"].add(1)
            if "bytes_postings" in acc:
                acc["bytes_postings"].add(len(pb))
            if "bytes_positions" in acc:
                acc["bytes_positions"].add(len(xb))
            out.append(
                (
                    term,
                    int(range_id),
                    blk,
                    int(d[0]),
                    int(d[-1]),
                    int(e - s),
                    int(t.sum()),
                    float(score_core.max()),
                    pb,
                    xb,
                )
            )

    return emit


def _make_group_builder(
    k1: float, b: float, avgdl: float, block_size: int, acc: dict
) -> Callable:
    """Position-level (term, range) group -> block rows: collapses the
    (docid, pos) stream to doc level, then emits blocks."""

    emit = _make_emitter(k1, b, avgdl, block_size, acc)

    def _build_group(
        term: str,
        range_id: int,
        docids: np.ndarray,
        poss: np.ndarray,
        dls: np.ndarray,
        out: list,
    ) -> None:
        doc_start = np.flatnonzero(np.diff(docids, prepend=-1))
        u_docids = docids[doc_start]
        tfs = np.diff(np.append(doc_start, docids.shape[0]))
        u_dls = dls[doc_start]
        if "postings_emitted" in acc:
            acc["postings_emitted"].add(int(u_docids.shape[0]))
        emit(term, range_id, u_docids, tfs, u_dls, poss, out)

    return _build_group


def make_block_builder(
    k1: float,
    b: float,
    avgdl: float,
    block_size: int,
    range_size: int,
    counters: dict | None = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Returns a mapInPandas function over a (term, docid, pos, dl) token
    stream shuffled by (term, range_id) — used by the streaming delta path.
    ``counters`` maps names to Spark accumulators (postings_emitted,
    blocks_built, bytes_postings, bytes_positions)."""

    acc = counters or {}
    _build_group = _make_group_builder(k1, b, avgdl, block_size, acc)

    def builder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None

        def process(pdf: pd.DataFrame, final: bool) -> pd.DataFrame | None:
            nonlocal carry
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                return None
            terms = pdf["term"].to_numpy()
            docids = pdf["docid"].to_numpy(dtype=np.int64)
            rng = docids // range_size
            if not final:
                # hold back the trailing (term, range) group — it may
                # continue in the next Arrow batch of this partition
                last_t, last_r = terms[-1], rng[-1]
                tail = (terms == last_t) & (rng == last_r)
                # tail is a suffix because input is sorted
                cut = int(tail.argmax()) if tail.any() else len(pdf)
                carry = pdf.iloc[cut:]
                pdf = pdf.iloc[:cut]
                if pdf.empty:
                    return None
                terms = terms[:cut]
                docids = docids[:cut]
                rng = rng[:cut]
            poss = pdf["pos"].to_numpy(dtype=np.int64)
            dls = pdf["dl"].to_numpy(dtype=np.int64)
            bounds = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (rng[1:] != rng[:-1])
            )
            starts = np.concatenate(([0], bounds + 1))
            ends = np.concatenate((bounds + 1, [len(pdf)]))
            out: list = []
            for s, e in zip(starts, ends):
                _build_group(
                    terms[s], int(rng[s]), docids[s:e], poss[s:e], dls[s:e], out
                )
            if not out:
                return None
            return pd.DataFrame(out, columns=_OUT_COLS)

        for pdf in batches:
            res = process(pdf, final=False)
            if res is not None:
                yield res
        if carry is not None and not carry.empty:
            tail, carry = carry, None
            res = process(tail, final=True)
            if res is not None:
                yield res

    return builder


def make_doc_range_builder(
    analyzer: str,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int,
    range_size: int,
    counters: dict | None = None,
    fields: list[str] | None = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """ZERO-SHUFFLE postings builder: mapInPandas directly over the docs/
    scan (docid, dl, text) — the main build path.

    Every posting group keys on (term, range_id = docid // range_size),
    and a scan split holds a contiguous slab of docids, so each split can
    tokenize its docs and assemble its (term, range) groups entirely
    locally: the exploded token stream (the ~30x-larger-than-text
    intermediate that round 1 shuffled by (term, range_id)) never touches
    the exchange. Head-term skew is structurally gone too: the unit of
    parallelism is a doc slab, which is uniform by construction, instead
    of a term's posting list.

    Groups cut by split boundaries yield PARTIAL blocks for the same
    (term, range_id) with disjoint docid slabs; make_block_merger folds
    them into full blocks during the bucket-coalesce shuffle.

    ``fields``: ordered indexed columns; field k's positions are packed
    as (k << 16) | pos — the reference's IDPRIORITY scheme
    (sindex.c:697-701) — so phrase adjacency stays in-field and the rank
    cascade unpacks field/position from one min().
    """
    acc = counters or {}
    fields = list(fields or ["text"])
    build_group = _make_group_builder(k1, b, avgdl, block_size, acc)

    def builder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from marlin_spark.oracle.tokenizer import analyze

        # accumulate the WHOLE partition before grouping: a partition may
        # pack many small docs files (Arrow batch each); building per
        # batch would fragment (term, range) groups into per-file partial
        # blocks. Memory is bounded by the scan split size
        # (build_scan_split_mb of text + ~10x that in token arrays).
        import time as _time

        def _lap(key, t0):
            if key in acc:
                acc[key].add(int((_time.time() - t0) * 1000))
            return _time.time()

        t = _time.time()
        parts = [pdf for pdf in batches if not pdf.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        t = _lap("ms_read", t)
        docids = pdf["docid"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        f_doc, f_dl, f_terms, f_pos = [], [], [], []
        for prio, fname in enumerate(fields):
            offset = prio << 16
            toks = [
                analyze(t, analyzer, "index") if t is not None else []
                for t in pdf[fname]
            ]
            counts = np.fromiter(
                (len(x) for x in toks), dtype=np.int64, count=len(toks)
            )
            ftotal = int(counts.sum())
            if ftotal == 0:
                continue
            t = _lap("ms_tokenize", t)
            terms_arr = np.empty(ftotal, dtype=object)
            pos_arr = np.empty(ftotal, dtype=np.int64)
            i = 0
            for tk in toks:
                for term, pos in tk:
                    terms_arr[i] = term
                    pos_arr[i] = pos + offset
                    i += 1
            f_doc.append(np.repeat(docids, counts))
            f_dl.append(np.repeat(dls, counts))
            f_terms.append(terms_arr)
            f_pos.append(pos_arr)
            t = _lap("ms_flatten", t)
        if not f_doc:
            return
        rep_doc = np.concatenate(f_doc)
        rep_dl = np.concatenate(f_dl)
        flat_terms = np.concatenate(f_terms)
        flat_pos = np.concatenate(f_pos)
        total = rep_doc.size
        # integer term codes first: lexsort over ints, not strings
        codes, uniq = pd.factorize(flat_terms)
        rng = rep_doc // range_size
        order = np.lexsort((flat_pos, rep_doc, codes, rng))
        t = _lap("ms_sort", t)
        c = codes[order]
        r = rng[order]
        d = rep_doc[order]
        p = flat_pos[order]
        dl_o = rep_dl[order]
        bounds = np.flatnonzero((c[1:] != c[:-1]) | (r[1:] != r[:-1]))
        starts = np.concatenate(([0], bounds + 1))
        ends = np.concatenate((bounds + 1, [total]))
        out: list = []
        for s, e in zip(starts, ends):
            build_group(uniq[c[s]], int(r[s]), d[s:e], p[s:e], dl_o[s:e], out)
        t = _lap("ms_emit", t)
        yield pd.DataFrame(out, columns=_OUT_COLS)

    return builder


def make_block_merger(
    k1: float,
    b: float,
    avgdl: float,
    block_size: int,
    counters: dict | None = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Folds the doc-range builder's partial blocks into full blocks.

    Runs inside the bucket-coalesce shuffle (keyed by (bucket,
    range_id%4), which co-locates every block of a (term, range) group —
    bucket is a pure function of term). Partial blocks of one group cover
    DISJOINT docid slabs, so ordering them by first_docid and
    concatenating their decoded arrays reconstructs the full sorted
    group; re-cutting yields blocks bit-identical to a single-pass build.
    Input/output schema: BLOCK_SCHEMA + trailing bucket column.
    """
    acc = counters or {}
    emit = _make_emitter(k1, b, avgdl, block_size, acc)

    def merger(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time as _time

        _t0 = _time.time()
        parts = [pdf for pdf in batches if not pdf.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        terms = pdf["term"].to_numpy()
        rng = pdf["range_id"].to_numpy(dtype=np.int64)
        first = pdf["first_docid"].to_numpy(dtype=np.int64)
        buckets = pdf["bucket"].to_numpy(dtype=np.int64)
        codes, uniq = pd.factorize(terms)
        order = np.lexsort((first, rng, codes))
        c = codes[order]
        r = rng[order]
        bounds = np.flatnonzero((c[1:] != c[:-1]) | (r[1:] != r[:-1]))
        starts = np.concatenate(([0], bounds + 1))
        ends = np.concatenate((bounds + 1, [len(pdf)]))
        post_col = pdf["postings"].to_numpy()
        posx_col = pdf["positions"].to_numpy()
        out: list = []
        out_buckets: list = []
        for s, e in zip(starts, ends):
            rows = order[s:e]
            if e - s == 1:
                # single source block: already full, pass through untouched
                i = rows[0]
                t = pdf.iat[i, pdf.columns.get_loc("term")]
                row = (
                    t, int(rng[i]), int(pdf.iat[i, pdf.columns.get_loc("block_id")]),
                    int(first[i]),
                    int(pdf.iat[i, pdf.columns.get_loc("last_docid")]),
                    int(pdf.iat[i, pdf.columns.get_loc("n_docs")]),
                    int(pdf.iat[i, pdf.columns.get_loc("sum_tf")]),
                    float(pdf.iat[i, pdf.columns.get_loc("max_tfnorm")]),
                    post_col[i], posx_col[i],
                )
                if "blocks_built" in acc:
                    acc["blocks_built"].add(1)
                if "bytes_postings" in acc:
                    acc["bytes_postings"].add(len(post_col[i]))
                if "bytes_positions" in acc:
                    acc["bytes_positions"].add(len(posx_col[i]))
                out.append(row)
                out_buckets.append(int(buckets[i]))
                continue
            d_parts, tf_parts, dl_parts, pos_parts = [], [], [], []
            for i in rows:  # already ordered by first_docid (disjoint slabs)
                dd, tt, ll = decode_block(bytes(post_col[i]))
                pp = decode_positions(bytes(posx_col[i]), tt)
                d_parts.append(dd)
                tf_parts.append(tt)
                dl_parts.append(ll)
                pos_parts.append(pp)
            emit(
                uniq[c[s]],
                int(r[s]),
                np.concatenate(d_parts),
                np.concatenate(tf_parts),
                np.concatenate(dl_parts),
                np.concatenate(pos_parts).astype(np.int64),
                out,
            )
            out_buckets.extend([int(buckets[rows[0]])] * (len(out) - len(out_buckets)))
        res = pd.DataFrame(out, columns=_OUT_COLS)
        res["bucket"] = pd.Series(out_buckets, dtype="int32")
        if "ms_merge" in acc:
            acc["ms_merge"].add(int((_time.time() - _t0) * 1000))
        yield res

    return merger


def make_compaction_rewriter(
    k1: float,
    b: float,
    new_avgdl: float,
    block_size: int,
    deleted: np.ndarray | None = None,
    counters: dict | None = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Compaction kernel: rewrites EVERY (term, range) group — merging
    base + delta-segment blocks, dropping tombstoned docids, and
    recomputing max_tfnorm with the POST-compaction avgdl.

    The avgdl recompute is correctness-critical, not cosmetic: block-max
    WAND treats max_tfnorm as an upper bound of tf/(tf + k1(1-b) +
    k1*b*dl/avgdl) under the avgdl the QUERY uses. Compaction refreshes
    stats.json's avgdl; if avgdl shrinks (deletes, shorter new docs), a
    stale stored max computed under the old avgdl UNDERSTATES the bound
    and WAND would skip ranges that hold true top-k docs.

    ``deleted``: sorted int64 docid tombstones, captured in the closure.
    At 10^12-doc scale the tombstone set between compactions is bounded
    by ingest batch size; were it ever huge, the same kernel runs after a
    docid-range co-partitioned join instead of a broadcast closure.
    Input: BLOCK_SCHEMA rows repartitioned by a key that co-locates each
    (term, range) group (e.g. (bucket, range_id%4)). Output: BLOCK_SCHEMA.
    """
    acc = counters or {}
    emit = _make_emitter(k1, b, new_avgdl, block_size, acc)

    def rewriter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in batches if not pdf.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        terms = pdf["term"].to_numpy()
        rng = pdf["range_id"].to_numpy(dtype=np.int64)
        first = pdf["first_docid"].to_numpy(dtype=np.int64)
        codes, uniq = pd.factorize(terms)
        order = np.lexsort((first, rng, codes))
        c = codes[order]
        r = rng[order]
        bounds = np.flatnonzero((c[1:] != c[:-1]) | (r[1:] != r[:-1]))
        starts = np.concatenate(([0], bounds + 1))
        ends = np.concatenate((bounds + 1, [len(pdf)]))
        post_col = pdf["postings"].to_numpy()
        posx_col = pdf["positions"].to_numpy()
        out: list = []
        for s, e in zip(starts, ends):
            d_parts, tf_parts, dl_parts, pos_parts = [], [], [], []
            for i in order[s:e]:  # ordered by first_docid (disjoint slabs)
                dd, tt, ll = decode_block(bytes(post_col[i]))
                pp = decode_positions(bytes(posx_col[i]), tt)
                if deleted is not None and deleted.size and dd.size:
                    d64 = dd.astype(np.int64)
                    idx = np.searchsorted(deleted, d64)
                    idx[idx >= deleted.size] = deleted.size - 1
                    keep = deleted[idx] != d64
                    if not keep.all():
                        pos_keep = np.repeat(keep, tt.astype(np.int64))
                        dd, tt, ll = dd[keep], tt[keep], ll[keep]
                        pp = pp[pos_keep]
                if dd.size == 0:
                    continue
                d_parts.append(dd)
                tf_parts.append(tt)
                dl_parts.append(ll)
                pos_parts.append(pp)
            if not d_parts:
                continue
            emit(
                uniq[c[s]],
                int(r[s]),
                np.concatenate(d_parts),
                np.concatenate(tf_parts),
                np.concatenate(dl_parts),
                np.concatenate(pos_parts).astype(np.int64),
                out,
            )
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)

    return rewriter
