"""Posting-block builder: mapInPandas over the sorted token stream.

Input: partitions of (term, docid, pos, dl) rows sorted by
(term, range_id, docid, pos), where range_id = docid // range_size and the
shuffle key was (term, range_id) — so every (term, range) group lies whole
inside one partition (possibly spanning Arrow batches, handled by
carry-over). This is the explicit head-term-skew salt: a Zipf head term's
postings split into n_docs/range_size independent groups instead of one
hot reducer (north rule requirement; the reference has no analog — its
single-writer design serializes instead, /root/reference/src/main/index.c:221-240).

Each group is cut into blocks of <= block_size docs (never crossing the
range boundary — the roaring-container echo, /root/reference/src/main/cont.h:8-14),
delta+varbyte-compressed, and emitted with skip-pointer metadata
(first/last docid) + block-max BM25 tf-norm (multiplied by idf at query
time to give the block-max WAND upper bound).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from marlin_spark.functions.codec import encode_block

BLOCK_SCHEMA = (
    "term string, range_id int, block_id int, first_docid long, "
    "last_docid long, n_docs int, sum_tf long, max_tfnorm double, "
    "postings binary, positions binary"
)

_OUT_COLS = [
    "term", "range_id", "block_id", "first_docid", "last_docid",
    "n_docs", "sum_tf", "max_tfnorm", "postings", "positions",
]


def make_block_builder(
    k1: float,
    b: float,
    avgdl: float,
    block_size: int,
    range_size: int,
    counters: dict | None = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Returns a mapInPandas function. ``counters`` maps names to Spark
    accumulators (postings_emitted, blocks_built, bytes_postings,
    bytes_positions)."""

    norm_c = k1 * (1.0 - b)
    norm_s = k1 * b / avgdl if avgdl > 0 else 0.0
    acc = counters or {}

    def _build_group(
        term: str,
        range_id: int,
        docids: np.ndarray,
        poss: np.ndarray,
        dls: np.ndarray,
        out: list,
    ) -> None:
        # rows are position-level; collapse to doc level
        doc_start = np.flatnonzero(np.diff(docids, prepend=-1))
        u_docids = docids[doc_start]
        tfs = np.diff(np.append(doc_start, docids.shape[0]))
        u_dls = dls[doc_start]
        n = u_docids.shape[0]
        pos_starts = doc_start
        pos_ends = np.append(doc_start[1:], docids.shape[0])
        for blk, s in enumerate(range(0, n, block_size)):
            e = min(s + block_size, n)
            d = u_docids[s:e].astype(np.uint64)
            t = tfs[s:e].astype(np.uint64)
            l = u_dls[s:e].astype(np.uint64)
            p = poss[pos_starts[s]:pos_ends[e - 1]].astype(np.int64)
            pb, xb = encode_block(d, t, l, p)
            tfn = t.astype(np.float64)
            score_core = tfn * (k1 + 1.0) / (tfn + norm_c + norm_s * l.astype(np.float64))
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
        if acc:
            acc["postings_emitted"].add(int(n))
            acc["blocks_built"].add((n + block_size - 1) // block_size)

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
            res = pd.DataFrame(out, columns=_OUT_COLS)
            if acc:
                acc["bytes_postings"].add(int(res["postings"].str.len().sum()))
                acc["bytes_positions"].add(int(res["positions"].str.len().sum()))
            return res

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
