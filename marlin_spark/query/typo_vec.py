"""Vectorized Damerau-Levenshtein (OSA) matching over term batches.

The reference bounds typo lookup with a banded DP walked over its trie
(node_lev/lookup_typo, /root/reference/src/main/dtrie.c:702-791). The
distributed analog runs the SAME banded OSA DP, but vectorized with
numpy across every candidate term of an Arrow batch at once: the DP
iterates over the query's characters (m iterations) and, inside, over at
most m + maxdist term positions — each step an O(n_terms) vector op —
instead of a Python-level loop per term (the round-1 plan flagged as a
scale-killer).

Semantics are pinned to the scalar oracle (marlin_spark.oracle.typo,
itself pinned by the levenshtein.robot goldens):
- restricted Damerau (optimal string alignment): adjacent transposition
  costs 1, no substring reuse;
- prefix mode: a term matches if ANY of its prefixes is within maxdist —
  read off the final DP row (entry j = OSA(query, term[:j])), so one DP
  answers both modes.

Property-tested against the scalar oracle over random strings
(tests/test_typo.py).
"""

from __future__ import annotations

import numpy as np


def osa_match_batch(
    query: str, terms: np.ndarray, prefix: bool, d: int
) -> np.ndarray:
    """Boolean array: does each term match ``query`` within OSA distance
    ``d`` (prefix mode: any prefix of the term within ``d``)?"""
    return osa_dist_batch(query, terms, prefix, d) <= d


def osa_dist_batch(
    query: str, terms: np.ndarray, prefix: bool, d: int
) -> np.ndarray:
    """Best OSA distance per term, banded at ``d``: values > d mean "no
    match within d" (the DP is cut off there, like the reference's banded
    trie walk). Prefix mode returns the min distance over the term's
    prefixes — the value the reference stores per matched word in
    WID2TYPOS and reads back as the `typos` rank feature (docrank.c).

    ``terms``: object ndarray of strings.
    """
    n = terms.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    m = len(query)
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
    out = np.full(n, d + 1, dtype=np.int64)
    # length band (two-sided when exact; lower-only when prefix — but the
    # DP itself only ever looks at the first m + d characters, since a
    # longer prefix is at distance >= plen - m > d)
    lo = max(1, m - d)
    cand = lens >= lo
    if not prefix:
        cand &= lens <= m + d
    if not cand.any():
        return out
    idx = np.flatnonzero(cand)
    sub = terms[idx]
    sub_lens = lens[idx]
    L = int(min(sub_lens.max(), m + d))
    # padded char-code matrix; -1 never equals a query char
    C = np.full((idx.size, L), -1, dtype=np.int64)
    for i, t in enumerate(sub):
        k = min(len(t), L)
        C[i, :k] = np.frombuffer(t[:k].encode("utf-32-le"), dtype=np.uint32)[
            :k
        ].astype(np.int64)
    q = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)

    prev = np.broadcast_to(
        np.arange(L + 1, dtype=np.int64), (idx.size, L + 1)
    ).copy()  # row i=0: distance to empty query = j insertions
    prev2 = None
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        qi = q[i - 1]
        cost = (C != qi).astype(np.int64)  # (n, L)
        for j in range(1, L + 1):
            v = np.minimum(prev[:, j] + 1, prev[:, j - 1] + cost[:, j - 1])
            np.minimum(v, cur[:, j - 1] + 1, out=v)
            if i > 1 and j > 1:
                tr = (C[:, j - 1] == q[i - 2]) & (C[:, j - 2] == qi)
                np.minimum(v, np.where(tr, prev2[:, j - 2] + 1, v), out=v)
            cur[:, j] = v
        prev2, prev = prev, cur
    final = prev  # final[i, j] = OSA(query, term_i[:j]) for j <= len(term_i)
    if prefix:
        # min over valid prefixes j in [lo, len]; positions past the term
        # length are padding
        jcols = np.arange(L + 1)
        valid = (jcols[None, :] >= lo) & (
            jcols[None, :] <= np.minimum(sub_lens, L)[:, None]
        )
        masked = np.where(valid, final, np.iinfo(np.int64).max)
        best = masked.min(axis=1)
    else:
        cols = np.minimum(sub_lens, L).astype(np.int64)
        best = final[np.arange(idx.size), cols]
    out[idx] = np.minimum(best, d + 1)
    return out
