"""Block-max WAND top-k scorer over compressed posting blocks.

Runs as mapInPandas over matched block rows repartitioned by doc range
(range_id). Within a partition, ranges are processed in descending
upper-bound order with the top-k threshold THETA carried across ranges:

- range upper bound = sum over query terms of idf * max(block max_tfnorm
  in range): if ub <= THETA the WHOLE range (all its blocks, all terms) is
  skipped without decoding — this is block-max pruning at doc-range
  granularity, which is *sound for exact scores*: a pruned range cannot
  contain a top-k doc, and no surviving doc ever loses a term
  contribution (pruning single blocks of one term would silently corrupt
  scores of docs that other terms still emit — the classic per-block WAND
  pivot needs doc-at-a-time cursors, a scalar loop that belongs in native
  code, not in a Python executor).
- surviving ranges decode (docids, tfs, dls) — the positions column is
  never read (parquet column pruning) — and score fully vectorized:
  per-term scores concatenated, stable-argsorted by docid (terms iterate
  in sorted order => accumulation order matches the oracle), summed with
  np.add.reduceat.

Reference analog: the fast-rank partial scan + early termination
(/root/reference/src/main/docrank.c:478-574); ours prunes with provable
score bounds instead of sampling.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from marlin_spark.functions.codec import decode_blocks_many

_EPS = 1e-9


def _mask_deleted(docids: np.ndarray, deleted: np.ndarray | None) -> np.ndarray | None:
    """Boolean keep-mask for docids not in the sorted tombstone array
    (None when nothing is deleted — avoids the copy on the common path)."""
    if deleted is None or deleted.size == 0 or docids.size == 0:
        return None
    docids = docids.astype(np.int64, copy=False)  # decode yields uint64
    idx = np.searchsorted(deleted, docids)
    idx[idx >= deleted.size] = deleted.size - 1
    hit = deleted[idx] == docids
    if not hit.any():
        return None
    return ~hit


def make_wand_scorer(
    term_meta: dict[str, tuple[float, int]],
    k: int,
    n_slots: int,
    mode: str = "any",
    k1: float = 1.2,
    b: float = 0.75,
    avgdl: float = 1.0,
    counters: dict | None = None,
    deleted: "np.ndarray | None" = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """term_meta: term -> (idf, slot). Slots group prefix expansions with
    their source word for conjunctive (mode='all') matching; n_slots is
    the number of required slots. ``deleted``: sorted int64 tombstone
    docids, masked out right after block decode so a deleted doc can
    neither score nor occupy a top-k slot (block-max values stay valid
    upper bounds — they bound a superset)."""

    norm_c = k1 * (1.0 - b)
    norm_s = k1 * b / avgdl if avgdl > 0 else 0.0
    acc = counters or {}

    def scorer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = [pdf for pdf in batches if not pdf.empty]
        if not rows:
            yield pd.DataFrame({"docid": pd.Series([], dtype="int64"),
                                "score": pd.Series([], dtype="float64")})
            return
        all_blocks = pd.concat(rows, ignore_index=True)

        # group blocks by range, compute each range's upper bound
        ranges: dict[int, list] = {}
        for t in all_blocks.itertuples(index=False):
            ranges.setdefault(t.range_id, []).append(t)
        ubs = []
        for rid, blks in ranges.items():
            per_term_max: dict[str, float] = {}
            for blk in blks:
                idf = term_meta[blk.term][0]
                v = idf * blk.max_tfnorm
                if v > per_term_max.get(blk.term, -1.0):
                    per_term_max[blk.term] = v
            ubs.append((sum(per_term_max.values()), rid))
        ubs.sort(reverse=True)

        top_d = np.empty(0, dtype=np.int64)
        top_s = np.empty(0, dtype=np.float64)
        theta = -np.inf
        skipped = 0

        for ub, rid in ubs:
            # strict: a range whose bound EQUALS theta can still hold an
            # equal-score doc that wins the docid tie-break
            if top_d.size >= k and ub < theta - _EPS:
                skipped += 1
                continue
            # decode the WHOLE range in one varbyte pass (terms sorted ->
            # accumulation order matches the oracle); per-block decode_block
            # calls were ~50 us of numpy overhead each, the dominant cost
            # of the driver-local path at 100+ blocks per head-term query
            blks = sorted(ranges[rid], key=lambda t: (t.term, t.block_id))
            nb = len(blks)
            nd = np.fromiter((b_.n_docs for b_ in blks), np.int64, nb)
            d, tfs, dls, _ = decode_blocks_many(
                [b_.postings for b_ in blks], nd
            )
            s = np.repeat(
                np.fromiter((term_meta[b_.term][0] for b_ in blks), np.float64, nb),
                nd,
            )
            slots_all = np.repeat(
                np.fromiter((term_meta[b_.term][1] for b_ in blks), np.int64, nb),
                nd,
            )
            keep = _mask_deleted(d, deleted)
            if keep is not None:
                d, tfs, dls = d[keep], tfs[keep], dls[keep]
                s, slots_all = s[keep], slots_all[keep]
            if d.size == 0:  # every posting in the range was tombstoned
                continue
            tfn = tfs.astype(np.float64)
            s = s * tfn * (k1 + 1.0) / (
                tfn + norm_c + norm_s * dls.astype(np.float64)
            )
            order = np.argsort(d, kind="stable")
            d, s = d[order], s[order]
            starts = np.flatnonzero(np.diff(d, prepend=-1))
            scores = np.add.reduceat(s, starts)
            u_docids = d[starts]
            if mode == "all" and n_slots > 0:
                slots = slots_all[order]
                # distinct slots per doc: sort (doc, slot) pairs
                key = d * (n_slots + 1) + slots
                uniq = np.unique(key)
                cnt = np.bincount(
                    np.searchsorted(u_docids, uniq // (n_slots + 1)),
                    minlength=u_docids.shape[0],
                )
                keep = cnt >= n_slots
                u_docids, scores = u_docids[keep], scores[keep]
            if u_docids.size == 0:
                continue
            top_d = np.concatenate([top_d, u_docids])
            top_s = np.concatenate([top_s, scores])
            if top_d.size > k:
                # same comparator as the global merge: rounded score desc,
                # docid asc — keeps partition-local and global top-k
                # selections consistent under ties
                order = np.lexsort((top_d, -np.round(top_s, 9)))[:k]
                top_d, top_s = top_d[order], top_s[order]
            if top_d.size >= k:
                theta = top_s.min()
        if acc:
            acc["ranges_skipped"].add(skipped)
            acc["ranges_scored"].add(len(ubs) - skipped)
        yield pd.DataFrame({"docid": top_d, "score": top_s})

    return scorer


def make_batch_wand_scorer(
    query_metas: dict[str, dict[str, tuple[float, int]]],
    n_slots: dict[str, int],
    k: int,
    mode: str = "any",
    k1: float = 1.2,
    b: float = 0.75,
    avgdl: float = 1.0,
    deleted: "np.ndarray | None" = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Batched WAND: scores MANY queries in one pass over the matched
    blocks of their term union. Each block is decoded ONCE per range;
    every query referencing the term reuses the decoded arrays. Range-
    level block-max pruning runs per query (each query carries its own
    theta). Output: per-partition top-k per query — thousands of rows
    instead of the exact path's |candidates| x |queries| shuffle.
    """
    norm_c = k1 * (1.0 - b)
    norm_s = k1 * b / avgdl if avgdl > 0 else 0.0
    # term -> [(qid, idf, slot)]
    by_term: dict[str, list] = {}
    for qid, meta in query_metas.items():
        for t, (idf, slot) in meta.items():
            by_term.setdefault(t, []).append((qid, idf, slot))

    def scorer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = [pdf for pdf in batches if not pdf.empty]
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="object"),
                "docid": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
        if not rows:
            yield empty
            return
        all_blocks = pd.concat(rows, ignore_index=True)
        ranges: dict[int, list] = {}
        for t in all_blocks.itertuples(index=False):
            ranges.setdefault(t.range_id, []).append(t)

        # per-range per-term upper bounds, then per-query range ubs
        state = {
            qid: {"d": np.empty(0, np.int64), "s": np.empty(0, np.float64),
                  "theta": -np.inf}
            for qid in query_metas
        }
        range_term_max: dict[int, dict[str, float]] = {}
        for rid, blks in ranges.items():
            m: dict[str, float] = {}
            for blk in blks:
                if blk.max_tfnorm > m.get(blk.term, -1.0):
                    m[blk.term] = blk.max_tfnorm
            range_term_max[rid] = m

        # process ranges in descending total-ub order (thetas rise fast)
        order = sorted(
            ranges,
            key=lambda rid: -sum(range_term_max[rid].values()),
        )
        for rid in order:
            tmax = range_term_max[rid]
            # which queries still need this range?
            active = []
            for qid, meta in query_metas.items():
                st = state[qid]
                ub = sum(
                    idf * tmax[t]
                    for t, (idf, _) in meta.items()
                    if t in tmax
                )
                if ub <= 0:
                    continue
                if st["d"].size >= k and ub < st["theta"] - _EPS:
                    continue
                active.append(qid)
            if not active:
                continue
            # decode each needed term once
            needed = {
                t
                for qid in active
                for t in query_metas[qid]
                if t in tmax
            }
            decoded: dict[str, tuple] = {}
            blks = [
                b_
                for b_ in sorted(ranges[rid], key=lambda t: (t.term, t.block_id))
                if b_.term in needed
            ]
            if blks:
                # one varbyte pass for the whole range; blocks are term-
                # sorted so each term's docs are one contiguous span
                nb = len(blks)
                nd = np.fromiter((b_.n_docs for b_ in blks), np.int64, nb)
                d_all, tf_all, dl_all, d_start = decode_blocks_many(
                    [b_.postings for b_ in blks], nd
                )
                keep = _mask_deleted(d_all, deleted)
                tfn = tf_all.astype(np.float64)
                core_all = tfn * (k1 + 1.0) / (
                    tfn + norm_c + norm_s * dl_all.astype(np.float64)
                )
                d_end = np.concatenate((d_start[1:], [d_all.size]))
                spans: dict[str, tuple[int, int]] = {}
                for i, b_ in enumerate(blks):
                    lo, hi = spans.get(b_.term, (int(d_start[i]), int(d_end[i])))
                    spans[b_.term] = (lo, int(d_end[i]))
                for term, (lo, hi) in spans.items():
                    d_t, c_t = d_all[lo:hi], core_all[lo:hi]
                    if keep is not None:
                        kk = keep[lo:hi]
                        d_t, c_t = d_t[kk], c_t[kk]
                    if d_t.size:
                        decoded[term] = (d_t, c_t)
            for qid in active:
                meta = query_metas[qid]
                parts_d, parts_s, parts_slot = [], [], []
                for t in sorted(meta):
                    if t not in decoded:
                        continue
                    d, core = decoded[t]
                    idf, slot = meta[t]
                    parts_d.append(d)
                    parts_s.append(idf * core)
                    parts_slot.append(np.full(d.shape[0], slot, np.int64))
                if not parts_d:
                    continue
                d = np.concatenate(parts_d)
                s = np.concatenate(parts_s)
                o = np.argsort(d, kind="stable")
                d, s = d[o], s[o]
                starts = np.flatnonzero(np.diff(d, prepend=-1))
                scores = np.add.reduceat(s, starts)
                u = d[starts]
                ns = n_slots[qid]
                if mode == "all" and ns > 0:
                    slots = np.concatenate(parts_slot)[o]
                    key = d * (ns + 1) + slots
                    uniq = np.unique(key)
                    cnt = np.bincount(
                        np.searchsorted(u, uniq // (ns + 1)),
                        minlength=u.shape[0],
                    )
                    keep = cnt >= ns
                    u, scores = u[keep], scores[keep]
                if u.size == 0:
                    continue
                st = state[qid]
                st["d"] = np.concatenate([st["d"], u])
                st["s"] = np.concatenate([st["s"], scores])
                if st["d"].size > k:
                    oo = np.lexsort((st["d"], -np.round(st["s"], 9)))[:k]
                    st["d"], st["s"] = st["d"][oo], st["s"][oo]
                if st["d"].size >= k:
                    st["theta"] = st["s"].min()
        out_q, out_d, out_s = [], [], []
        for qid, st in state.items():
            out_q.extend([qid] * st["d"].size)
            out_d.append(st["d"])
            out_s.append(st["s"])
        if not out_q:
            yield empty
            return
        yield pd.DataFrame(
            {
                "query_id": out_q,
                "docid": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    return scorer
