"""Oracle index/BM25 semantics + corpus determinism (no Spark)."""

import math

from marlin_spark.oracle import corpus
from marlin_spark.oracle.bm25 import OracleIndex, assign_docids
from marlin_spark.oracle.tokenizer import tokenize

RANK_DOCS = [
    (1, "this is worst"),
    (2, "this is best"),
    (3, "this best worst"),
    (4, "testing this"),
    (5, "test"),
]

TERMS_DOCS = [
    (1, "aaaa"),
    (2, "aaaa bbbb"),
    (3, "aaaa bbbb cccc"),
    (4, "aaaa bbbb cccc dddd"),
    (5, "aaaa bbbb cccc dddd eeee"),
    (6, "aaaabbbb cccc dddd eeee"),
    (7, "aaaa bbbbcccc ddddeeee"),
    (8, "aaaabbbbccccddddeeee"),
]


def test_df_idf_dl():
    idx = OracleIndex(RANK_DOCS)
    assert idx.n_docs == 5
    assert idx.df("this") == 4
    assert idx.df("worst") == 2
    assert idx.df("nope") == 0
    assert idx.dl[5] == 1
    assert idx.avgdl == (3 + 3 + 3 + 2 + 1) / 5
    assert math.isclose(
        idx.idf("worst"), math.log((5 - 2 + 0.5) / (2 + 0.5) + 1)
    )


def test_search_exact_term():
    idx = OracleIndex(RANK_DOCS)
    hits = idx.search("worst", k=10)
    assert [d for d, _ in hits] == [1, 3] or [d for d, _ in hits] == [3, 1]
    # doc 1 dl=3 tf=1, doc 3 dl=3 tf=1 -> identical scores, docid tiebreak
    assert hits[0][0] == 1 and hits[0][1] == hits[1][1]


def test_search_empty_query_matches_all():
    # reference: empty query = all docids (/root/reference/src/main/squery.c:216-220)
    idx = OracleIndex(RANK_DOCS)
    assert [d for d, _ in idx.search("", k=10)] == [1, 2, 3, 4, 5]


def test_search_mode_all_vs_any():
    idx = OracleIndex(RANK_DOCS)
    any_hits = {d for d, _ in idx.search("this best", k=10, mode="any")}
    all_hits = {d for d, _ in idx.search("this best", k=10, mode="all")}
    assert any_hits == {1, 2, 3, 4}
    assert all_hits == {2, 3}


def test_search_prefix_last():
    idx = OracleIndex(RANK_DOCS)
    hits = {d for d, _ in idx.search("tes", k=10, prefix_last=True)}
    assert hits == {4, 5}  # testing, test
    none = idx.search("tes", k=10, prefix_last=False)
    assert none == []


def test_rarer_term_scores_higher():
    idx = OracleIndex(RANK_DOCS)
    # "best worst" over doc3 (has both) must outrank docs with one
    hits = idx.search("best worst", k=10)
    assert hits[0][0] == 3


def test_marlin_match_single_and_concat():
    # terms fixture semantics (/root/reference/test/robot/terms.robot)
    idx = OracleIndex(TERMS_DOCS)
    assert idx.marlin_match("aaaa", prefix_last=False) == {1, 2, 3, 4, 5, 7}
    # two words: (aaaa|aaaabbbb) & (aaaabbbb|bbbb) | aaaabbbb
    m = idx.marlin_match("aaaa bbbb", prefix_last=False)
    assert m == {2, 3, 4, 5, 6}
    # all five words, concatenated doc 8 matches via combined term
    m5 = idx.marlin_match("aaaa bbbb cccc dddd eeee", prefix_last=False)
    assert 8 in m5 and 5 in m5


def test_marlin_match_empty():
    idx = OracleIndex(TERMS_DOCS)
    assert idx.marlin_match("") == set(range(1, 9))


def test_assign_docids_stable():
    rows = [
        {"conv_id": "b", "turn_idx": 0, "text": "t3"},
        {"conv_id": "a", "turn_idx": 1, "text": "t2"},
        {"conv_id": "a", "turn_idx": 0, "text": "t1"},
    ]
    assert assign_docids(rows) == [(1, "t1"), (2, "t2"), (3, "t3")]


def test_corpus_deterministic_and_unique_keys():
    rows1 = corpus.tiny_corpus()
    rows2 = corpus.tiny_corpus()
    assert rows1 == rows2
    keys = {(r["conv_id"], r["turn_idx"]) for r in rows1}
    assert len(keys) == len(rows1)
    small = corpus.small_corpus(100)
    keys = {(r["conv_id"], r["turn_idx"]) for r in small}
    assert len(keys) == len(small)
    # per-turn regenerability (the distributed-generation invariant)
    r = corpus.turn_record(corpus.SEED, 5, 2)
    assert r["text"] == corpus.turn_text(corpus.SEED, 5, 2)


def test_corpus_contains_fixture_and_edge_material():
    rows = corpus.tiny_corpus()
    texts = [r["text"] for r in rows]
    assert "test" in texts and "aaaa bbbb cccc" in texts
    assert any("U.S.A." in t for t in texts)
    idx = OracleIndex(assign_docids(rows))
    assert idx.df("usa") >= 1
    assert idx.df("stateoftheart") >= 1


def test_head_term_skew_is_real():
    rows = corpus.small_corpus(200)
    idx = OracleIndex(assign_docids(rows))
    dfs = sorted((idx.df(t) for t in idx.postings), reverse=True)
    # Zipf head: most frequent term covers a large share of docs
    assert dfs[0] > idx.n_docs * 0.5
    assert dfs[0] > 20 * dfs[len(dfs) // 2]


def test_score_accumulation_order_fixed():
    idx = OracleIndex(RANK_DOCS)
    s = sum(idx.term_score(t, 3) for t in idx.query_terms("best worst this"))
    hits = dict(idx.search("best worst this", k=10))
    assert math.isclose(hits[3], s, rel_tol=0, abs_tol=0)


def test_tokenize_used_for_dl_counts_concat_emissions():
    idx = OracleIndex([(1, "state-of-the-art")])
    assert idx.dl[1] == len(tokenize("state-of-the-art")) == 5
