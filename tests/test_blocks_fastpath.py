"""Equivalence of the bandwidth-lean builder sort fast path.

The doc-range builder has two internal orderings (index/blocks.py):

- FAST: stable int32 argsort by term code alone, valid when the
  partition is single-field with monotone docids (the main build path);
- GENERIC: composite (range, code, docid, pos) int64-key sort, used for
  multi-field or out-of-order partitions.

Both must emit the SAME block set — same (term, range_id, block_id)
keys, same stats, byte-identical postings/positions payloads — since the
merger and every query path decode them interchangeably. Reference
analog: segment layout independence of build order
(/root/reference/src/main/sindex.c postings segments).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from marlin_spark.functions.codec import vb_decode, vb_encode_with_sizes
from marlin_spark.index.blocks import BLOCK_SCHEMA, make_doc_range_builder


def _run_builder(pdf: pd.DataFrame, force_generic: bool, block_size=4,
                 range_size=16) -> pd.DataFrame:
    builder = make_doc_range_builder(
        "marlin", 1.2, 0.75, 6.0, block_size, range_size,
        counters=None, fields=["text"], _force_generic=force_generic,
    )
    out = list(builder(iter([pdf])))
    assert out, "builder emitted nothing"
    res = pd.concat(out, ignore_index=True)
    key = ["term", "range_id", "block_id"]
    return res.sort_values(key).reset_index(drop=True)


def _corpus(n_docs: int, seed: int, start_docid: int = 1) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "run", "the", "tool",
             "query", "spark", "index"]
    texts, dls = [], []
    for _ in range(n_docs):
        n = int(rng.integers(1, 12))
        toks = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(n)]
        texts.append(" ".join(toks))
        dls.append(n)
    return pd.DataFrame(
        {
            "docid": np.arange(start_docid, start_docid + n_docs,
                               dtype=np.int64),
            "dl": np.asarray(dls, dtype=np.int64),
            "text": texts,
        }
    )


@pytest.mark.parametrize("seed", [7, 91])
def test_fast_path_matches_generic(seed):
    pdf = _corpus(120, seed)
    fast = _run_builder(pdf, force_generic=False)
    slow = _run_builder(pdf, force_generic=True)
    assert len(fast) == len(slow)
    for col in ("term", "range_id", "block_id", "first_docid",
                "last_docid", "n_docs", "sum_tf"):
        assert fast[col].tolist() == slow[col].tolist(), col
    assert np.allclose(fast["max_tfnorm"], slow["max_tfnorm"])
    assert fast["postings"].tolist() == slow["postings"].tolist()
    assert fast["positions"].tolist() == slow["positions"].tolist()


def test_non_monotone_partition_falls_back_correctly():
    # same docs, shuffled row order: the fast path must NOT fire (docids
    # non-monotone) and the generic sort restores identical blocks
    pdf = _corpus(80, seed=3)
    shuffled = pdf.sample(frac=1.0, random_state=5).reset_index(drop=True)
    a = _run_builder(pdf, force_generic=False)
    b = _run_builder(shuffled, force_generic=False)
    assert a["postings"].tolist() == b["postings"].tolist()
    assert a["positions"].tolist() == b["positions"].tolist()


def test_fast_path_spans_range_boundaries():
    # docids crossing several range_size=16 boundaries, block cuts inside
    pdf = _corpus(100, seed=11, start_docid=9)  # misaligned start
    fast = _run_builder(pdf, force_generic=False)
    slow = _run_builder(pdf, force_generic=True)
    assert fast["range_id"].nunique() > 3
    assert fast["postings"].tolist() == slow["postings"].tolist()


def test_vb_encode_uint32_input_identical():
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 1 << 31, size=10_000, dtype=np.int64)
    b64, s64 = vb_encode_with_sizes(vals.astype(np.uint64))
    b32, s32 = vb_encode_with_sizes(vals.astype(np.uint32))
    assert b64 == b32
    assert np.array_equal(s64, s32)
    assert np.array_equal(vb_decode(b64), vals.astype(np.uint64))
