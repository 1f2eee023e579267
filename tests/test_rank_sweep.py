"""Statistical rank-identity sweep: ~50 seeded random queries over a
1.4k-doc corpus, exact + WAND + batched-WAND vs the oracle
(FIXTURES.md §4 item 12, the wrk-equivalent set)."""

import random

import pytest

from marlin_spark.config import EngineConfig
from marlin_spark.index.build import IndexBuilder
from marlin_spark.oracle.bm25 import OracleIndex, assign_docids
from marlin_spark.oracle.corpus import VOCAB, small_corpus
from marlin_spark.query.engine import SearchEngine


def _queries(n=40, seed=3):
    rng = random.Random(seed)
    out = {}
    for i in range(n):
        words = [
            VOCAB[min(int(rng.expovariate(0.008)), len(VOCAB) - 1)]
            for _ in range(rng.randint(1, 3))
        ]
        out[f"q{i}"] = " ".join(words)
    # a few prefix-ish and fixture queries
    out["p1"], out["p2"] = "test", "state-of-the-art"
    return out


@pytest.fixture(scope="module")
def sweep(spark, tmp_path_factory):
    rows = small_corpus(300)
    d = str(tmp_path_factory.mktemp("sweep_idx"))
    cfg = EngineConfig(block_size=32, range_size=256, n_term_buckets=16)
    IndexBuilder(spark, d, cfg).build(spark.createDataFrame(rows), "sw")
    return SearchEngine(spark, d, cfg), OracleIndex(assign_docids(rows))


def test_sweep_exact_and_wand(sweep):
    eng, oracle = sweep
    qs = _queries()
    for qid, q in qs.items():
        want = [(d, round(s, 6)) for d, s in oracle.search(q, k=10)]
        got_exact = [
            (r["docid"], round(r["score"], 6))
            for r in eng.search(q, k=10, use_wand=False).collect()
        ]
        assert got_exact == want, (qid, q, "exact")
    # WAND on a subset (per-query Spark jobs are slower)
    for qid in list(qs)[:8] + ["p1", "p2"]:
        q = qs[qid]
        want = [(d, round(s, 6)) for d, s in oracle.search(q, k=10)]
        got = [
            (r["docid"], round(r["score"], 6))
            for r in eng.search(q, k=10, use_wand=True).collect()
        ]
        assert got == want, (qid, q, "wand")


def test_sweep_batched_wand(sweep):
    eng, oracle = sweep
    qs = _queries(30, seed=9)
    out = eng.search_many_wand(qs, k=10)
    got: dict = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["docid"], round(r["score"], 6))
        )
    for qid, q in qs.items():
        want = [
            (i + 1, d, round(s, 6))
            for i, (d, s) in enumerate(oracle.search(q, k=10))
        ]
        assert sorted(got.get(qid, [])) == want, (qid, q)
