"""Phrase matching from positional postings: engine vs oracle.
(The reference declared but never wrote its phrase index —
sindex.c:718-724; our positional layout provides it.)"""

import pytest

from marlin_spark.oracle.bm25 import phrase_match_oracle
from marlin_spark.query.engine import SearchEngine

PHRASES = [
    "this is",            # matches 'this is worst', 'this is best'
    "is worst",
    "best worst",         # adjacent in 'this best worst'
    "worst best",         # wrong order: no match
    "aaaa bbbb cccc",     # terms fixture
    "bbbb aaaa",          # reversed: no match
    "state-of-the-art",   # analyzer emission incl. concat positions
    "testing this",
    "nonexistent phrase",
]


@pytest.fixture(scope="module")
def engine(spark, tiny_index):
    d, cfg, _ = tiny_index
    return SearchEngine(spark, d, cfg)


@pytest.mark.parametrize("q", PHRASES)
def test_phrase_match_parity(engine, tiny_oracle, q):
    got = {r["docid"] for r in engine.phrase_match(q).collect()}
    want = phrase_match_oracle(tiny_oracle, q)
    assert got == want, (q, got ^ want)


def test_phrase_vs_conjunctive(engine, tiny_oracle):
    # 'worst best': both words present in doc 3 ('this best worst') but
    # not adjacent in that order -> conjunctive matches, phrase does not
    conj = {d for d, _ in tiny_oracle.search("worst best", k=100, mode="all")}
    phr = phrase_match_oracle(tiny_oracle, "worst best")
    assert conj and not phr
    assert engine.phrase_match("worst best").count() == 0
