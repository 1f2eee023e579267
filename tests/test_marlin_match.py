"""Marlin matching-semantics parity: engine vs oracle term algebra
(terms fixture, /root/reference/test/robot/terms.robot ported to
transcript turns; SURVEY §2.3)."""

import pytest

from marlin_spark.query.engine import SearchEngine

MATCH_QUERIES = [
    ("aaaa", False),
    ("aaaa", True),
    ("aaaa bbbb", False),
    ("aaaa bbbb cccc", False),
    ("aaaa bbbb cccc dddd eeee", False),
    ("bbbb cccc", True),
    ("test", False),
    ("tes", True),          # prefix
    ("this best", False),
    ("", True),             # empty = all docs
    ("nonexistentzzz", False),
]


@pytest.fixture(scope="module")
def engine(spark, tiny_index):
    d, cfg, _ = tiny_index
    return SearchEngine(spark, d, cfg)


@pytest.mark.parametrize("q,prefix", MATCH_QUERIES)
def test_marlin_match_parity(engine, tiny_oracle, q, prefix):
    got = {r["docid"] for r in engine.match_marlin(q, prefix_last=prefix).collect()}
    want = tiny_oracle.marlin_match(q, prefix_last=prefix)
    assert got == want, (q, prefix, got ^ want)
