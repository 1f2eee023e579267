"""Multi-field indexing with per-field priorities (reference:
`indexedFields` settings + IDPRIORITY packing sindex.c:697-701, schema
walk sindex.c:792-893). Positions are stored packed (priority << 16 |
pos), so the rank cascade's field feature, in-field phrase adjacency and
cross-field search all derive from one layout."""

import datetime as dt

import pytest

from marlin_spark.config import EngineConfig
from marlin_spark.index.build import IndexBuilder
from marlin_spark.query.engine import SearchEngine

ROWS = [  # (conv, turn, role, text, tool) -> docids 1..3
    ("c", 0, "assistant", "alpha beta gamma", None),
    ("c", 1, "user", "delta assistant epsilon", "search"),
    ("c", 2, "tool", "zeta eta", "assistant"),
]

CFG = EngineConfig(
    indexed_fields=("text", "role", "tool"),
    block_size=8,
    range_size=64,
    n_term_buckets=4,
)


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mf_idx"))
    df = spark.createDataFrame(
        [r + (dt.datetime(2024, 1, 1, 0, 0, r[1]),) for r in ROWS],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    IndexBuilder(spark, d, CFG).build(df, "mf")
    return SearchEngine(spark, d, CFG)


def test_search_matches_across_fields(mf_index):
    ids = {r["docid"] for r in mf_index.search("assistant", k=10).collect()}
    assert ids == {1, 2, 3}  # role field, text field, tool field


def test_dl_counts_all_indexed_fields(mf_index):
    # doc 1: 3 text tokens + 1 role token + 0 tool tokens
    docs = {r["docid"]: r["dl"] for r in mf_index._docs_df().collect()}
    assert docs[1] == 4
    assert docs[2] == 3 + 1 + 1  # text 3 + role 'user' + tool 'search'


def test_rank_field_feature_orders_by_priority(mf_index):
    hits = mf_index.search_ranked("assistant", explain=True).collect()
    by_doc = {r["docid"]: r for r in hits}
    assert by_doc[2]["field"] == 0 and by_doc[2]["position"] == 2  # text
    assert by_doc[1]["field"] == 1 and by_doc[1]["position"] == 1  # role
    assert by_doc[3]["field"] == 2 and by_doc[3]["position"] == 1  # tool
    # cascade: typos/proximity tie -> field asc decides
    assert [r["docid"] for r in hits] == [2, 1, 3]


def test_phrase_never_crosses_field_boundaries(mf_index):
    assert {r["docid"] for r in mf_index.phrase_match("alpha beta").collect()} == {1}
    # 'gamma' ends the text field of doc 1, 'assistant' starts its role
    # field — packed positions make them non-adjacent by construction
    assert mf_index.phrase_match("gamma assistant").count() == 0
