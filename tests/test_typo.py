"""Typo matching parity: levenshtein.robot goldens + engine vs oracle
(/root/reference/test/robot/levenshtein.robot:24-92; FIXTURES.md §3.3)."""

import datetime as dt

import pytest

from marlin_spark.config import EngineConfig
from marlin_spark.index.build import IndexBuilder
from marlin_spark.oracle.typo import expand_typo, maxdist, osa_distance
from marlin_spark.query.engine import SearchEngine

LEV_WORDS = [
    "test", "best", "atest", "testa", "tset", "etst",
    "tets", "tesg", "tset", "tast", "tegt",
]

GOLDENS = [  # (query, expected match count), all prefix mode
    ("btest", 4),
    ("atest", 3),
    ("ctest", 3),
    ("tes", 3),
    ("te", 5),
    ("t", 8),
]


def test_maxdist_rule():
    # dtrie.c:766-770
    assert maxdist(1) == maxdist(3) == 0
    assert maxdist(4) == maxdist(7) == 1
    assert maxdist(8) == maxdist(20) == 2


def test_osa_transposition_counts_one():
    assert osa_distance("tset", "test") == 1
    assert osa_distance("etst", "test") == 1  # et<->te transposition
    assert osa_distance("abc", "abc") == 0
    assert osa_distance("abc", "acb") == 1


@pytest.mark.parametrize("q,want", GOLDENS)
def test_oracle_matches_robot_goldens(q, want):
    ms = set(expand_typo(q, set(LEV_WORDS), prefix=True))
    assert sum(1 for t in LEV_WORDS if t in ms) == want


@pytest.fixture(scope="module")
def lev_index(spark, tmp_path_factory):
    rows = [
        {
            "conv_id": "lev", "turn_idx": i, "role": "user",
            "text": w, "tool": None,
            "ts": dt.datetime(2024, 1, 1, 0, 0, i),
        }
        for i, w in enumerate(LEV_WORDS)
    ]
    d = str(tmp_path_factory.mktemp("lev_idx"))
    cfg = EngineConfig(block_size=8, range_size=64, n_term_buckets=4)
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    df = spark.createDataFrame(
        [tuple(r[k] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")) for r in rows],
        schema,
    )
    IndexBuilder(spark, d, cfg).build(df, "lv")
    return SearchEngine(spark, d, cfg)


@pytest.mark.parametrize("q,want", GOLDENS)
def test_engine_typo_match_counts(lev_index, q, want):
    assert lev_index.typo_match(q, prefix_last=True).count() == want


def test_engine_typo_exact_mode(lev_index):
    # without prefix: 'tes' (maxdist 0) matches nothing exactly
    assert lev_index.typo_match("tes", prefix_last=False).count() == 0
    # 'btest' dist<=1 non-prefix: test, best, atest
    assert lev_index.typo_match("btest", prefix_last=False).count() == 3
