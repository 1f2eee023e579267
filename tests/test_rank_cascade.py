"""Reference rank-cascade parity: rank.robot `_explain` goldens
(/root/reference/test/robot/rank.robot:24-100) + sortBy/rankBy wiring
(index.c:1134-1148, sort.robot) over the robot fixture corpus."""

import datetime as dt

import pytest

from marlin_spark.config import EngineConfig
from marlin_spark.index.build import IndexBuilder
from marlin_spark.query.engine import SearchEngine

DOCS = [  # rank.robot:24-33 fixture; docid = turn_idx + 1
    "this is worst",
    "this is best",
    "this best worst",
    "testing this",
    "test",
]


@pytest.fixture(scope="module")
def rank_index(spark, tmp_path_factory):
    rows = [
        ("rank", i, "user", t, None, dt.datetime(2024, 1, 1, 0, 0, i))
        for i, t in enumerate(DOCS)
    ]
    d = str(tmp_path_factory.mktemp("rank_idx"))
    cfg = EngineConfig(block_size=8, range_size=64, n_term_buckets=4)
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    IndexBuilder(spark, d, cfg).build(df, "rk")
    return SearchEngine(spark, d, cfg)


def _hits(eng, q, **kw):
    rows = eng.search_ranked(q, k=20, explain=True, **kw).collect()
    return [
        (
            r["docid"],
            {
                "typos": r["typos"],
                "proximity": r["proximity"],
                "field": r["field"],
                "position": r["position"],
                "exact": r["exact"],
            },
        )
        for r in rows
    ]


def test_rank_robot_query_test(rank_index):
    hits = _hits(rank_index, "test")
    assert len(hits) == 4  # totalHits 4 (rank.robot:50)
    assert hits[0][1]["exact"] == 1 and hits[0][1]["field"] == 0
    assert hits[0][1]["position"] == 1
    assert hits[1][1]["exact"] == 0 and hits[1][1]["position"] == 1
    assert hits[1][1]["typos"] == 0
    assert hits[2][1]["typos"] == 1 and hits[2][1]["position"] == 2
    assert hits[3][1]["typos"] == 1 and hits[3][1]["position"] == 3
    assert [h[0] for h in hits] == [5, 4, 3, 2]


def test_rank_robot_query_th(rank_index):
    hits = _hits(rank_index, "th")
    assert len(hits) == 4  # rank.robot:66
    assert [h[1]["position"] for h in hits] == [1, 1, 1, 2]


def test_rank_robot_query_worst(rank_index):
    hits = _hits(rank_index, "worst")
    assert len(hits) == 2
    assert all(h[1]["position"] == 3 for h in hits)
    assert all(h[1]["exact"] == 1 for h in hits)


def test_rank_robot_query_wors(rank_index):
    hits = _hits(rank_index, "wors")
    assert len(hits) == 2
    assert all(h[1]["position"] == 3 for h in hits)
    assert all(h[1]["exact"] == 0 for h in hits)  # prefix, not exact


def test_rank_robot_query_wurs(rank_index):
    hits = _hits(rank_index, "wurs")
    assert len(hits) == 2
    assert all(h[1]["position"] == 3 for h in hits)
    assert all(h[1]["typos"] == 1 for h in hits)  # one substitution


def test_multiword_proximity_and_exact(rank_index):
    hits = _hits(rank_index, "best worst")
    assert [h[0] for h in hits] == [3]  # only doc 3 holds both words
    feat = hits[0][1]
    assert feat["proximity"] == 1  # adjacent at positions 2,3
    assert feat["typos"] == 0 and feat["exact"] == 2
    hits = _hits(rank_index, "this worst")
    assert [h[0] for h in hits] == [1, 3]  # tie -> docid order
    assert all(h[1]["proximity"] == 2 for h in hits)  # positions 1 vs 3


def test_empty_query_matches_all_with_zero_features(rank_index):
    hits = _hits(rank_index, "")
    assert [h[0] for h in hits] == [1, 2, 3, 4, 5]
    assert all(
        h[1] == {"typos": 0, "proximity": 0, "field": 0, "position": 0, "exact": 0}
        for h in hits
    )


def test_sort_by_prepends_compare(rank_index):
    # sortBy: the numeric rule comes FIRST (index.c:1139-1142)
    ids = [
        r["docid"]
        for r in rank_index.search_ranked("", sort_by="turn_idx").collect()
    ]
    assert ids == [5, 4, 3, 2, 1]  # desc default
    ids = [
        r["docid"]
        for r in rank_index.search_ranked(
            "", sort_by="turn_idx", ascending=True
        ).collect()
    ]
    assert ids == [1, 2, 3, 4, 5]


def test_rank_by_appends_compare(rank_index):
    # rankBy: cascade first, numeric compare breaks remaining ties
    # (index.c:1143-1145). 'worst' docs 1 and 3 tie on every cascade
    # feature; turn_idx desc puts doc 3 first.
    ids = [
        r["docid"]
        for r in rank_index.search_ranked("worst", rank_by="turn_idx").collect()
    ]
    assert ids == [3, 1]


def test_ranked_respects_deletes(rank_index, spark, tmp_path):
    import shutil

    from marlin_spark.streaming.incremental import IncrementalIndexer

    d = str(tmp_path / "rank_del")
    shutil.copytree(rank_index.cat.dir, d)
    cfg = rank_index.cfg
    IncrementalIndexer(spark, d, cfg).delete_docids([5])
    eng = SearchEngine(spark, d, cfg)
    hits = [r["docid"] for r in eng.search_ranked("test").collect()]
    assert hits == [4, 3, 2]
