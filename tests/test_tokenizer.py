"""Analyzer goldens pinning reference semantics
(/root/reference/src/analyzer/default_analyzer.c; FIXTURES.md §3.5)."""

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from marlin_spark.oracle.tokenizer import (
    analyze,
    normalize,
    simple_tokenize,
    tokenize,
    whitespace_tokenize,
)


def terms(text, mode="index"):
    return [t for t, _ in tokenize(text, mode)]


def test_abbreviation_dots():
    # default_analyzer.c:44-50
    assert tokenize("U.S.A. is big") == [("usa", 1), ("is", 2), ("big", 3)]
    assert terms("ab.cd") == ["ab", "cd"]


def test_apostrophe():
    # default_analyzer.c:51-55
    assert tokenize("don't stop") == [("dont", 1), ("stop", 2)]


def test_hyphen_dual_emit_index_mode():
    # default_analyzer.c:56-90: parts at incrementing positions, final part
    # shares the previous position, concatenation emitted at that position
    assert tokenize("state-of-the-art") == [
        ("state", 1),
        ("of", 2),
        ("the", 3),
        ("art", 3),
        ("stateoftheart", 3),
    ]
    assert tokenize("a-b c") == [("a", 1), ("b", 1), ("ab", 1), ("c", 2)]


def test_hyphen_search_mode_no_concat():
    # analyze_string_for_search: no concatenation emit
    assert tokenize("state-of-the-art", "search") == [
        ("state", 1),
        ("of", 2),
        ("the", 3),
        ("art", 3),
    ]


def test_trailing_hyphen_suppresses_concat():
    # the len-hs==0 goto (default_analyzer.c:82-84)
    assert tokenize("ab-cd-") == [("ab", 1), ("cd", 2)]


def test_casefold_stripmark():
    assert terms("Café MÜNSTER") == ["cafe", "munster"]
    assert terms("naïve") == ["naive"]


def test_compat_normalization():
    assert terms("ﬁnal ｆｕｌｌ") == ["final", "full"]


def test_long_token_buffer_reset():
    # default_analyzer.c:97-99: len resets at 127, remainder is emitted
    toks = tokenize("x " + "a" * 300 + " y")
    assert toks[0] == ("x", 1)
    assert toks[1] == ("a" * (300 - 254), 2)
    assert toks[2] == ("y", 3)


def test_exactly_127_at_end_is_emitted():
    toks = tokenize("a" * 127)
    assert toks == [("a" * 127, 1)]


def test_positions_one_based_and_underscore_is_token_char():
    assert tokenize("a_b c") == [("a_b", 1), ("c", 2)]


def test_empty_and_separator_only():
    assert tokenize("") == []
    assert tokenize("  ,,  !! ") == []


def test_simple_and_whitespace_analyzers():
    assert simple_tokenize("Hello, WORLD-42!") == [
        ("hello", 1),
        ("world", 2),
        ("42", 3),
    ]
    assert whitespace_tokenize("a  b\tc") == [("a", 1), ("b", 2), ("c", 3)]
    assert analyze("a-b", "marlin") == tokenize("a-b")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_tokenizer_total_and_deterministic(s):
    t1 = tokenize(s)
    t2 = tokenize(s)
    assert t1 == t2
    for term, pos in t1:
        assert term
        assert len(term) <= 127
        assert pos >= 1
        for ch in term:
            assert unicodedata.category(ch) in {
                "Ll", "Lo", "Pc", "Mc", "Mn", "Nd", "Nl", "No",
            }
    # positions are non-decreasing never jumping more than 1
    last = 0
    for _, pos in t1:
        assert pos <= last + 1
        last = max(last, pos)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=100))
def test_normalize_idempotent_ish(s):
    n1 = normalize(s)
    assert normalize(n1) == n1
