"""Fast-path / slow-path equivalence for the analyzer."""

from hypothesis import given, settings
from hypothesis import strategies as st

from marlin_spark.oracle import tokenizer as tk


def slow(text, mode="index"):
    fast = tk._tokenize_fast_ascii
    try:
        tk._tokenize_fast_ascii = lambda s: None
        return tk.tokenize(text, mode)
    finally:
        tk._tokenize_fast_ascii = fast


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=150))
def test_fast_path_equals_slow_path(s):
    for mode in ("index", "search"):
        assert tk.tokenize(s, mode) == slow(s, mode)


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(
            list("abcXYZ 019_\t\n,;!?\"()[]#%&*+=~/\\|<>{}@^$")
        ),
        max_size=200,
    )
)
def test_fast_path_equals_slow_path_allowed_alphabet(s):
    assert tk.tokenize(s) == slow(s)
    assert tk._tokenize_fast_ascii(s) is not None  # guard accepts these


def test_fast_path_declines_specials_and_controls():
    for s in ["a.b", "don't", "x-y", "ab\x01cd", "café", "a" * 127]:
        assert tk._tokenize_fast_ascii(s) is None
        tk.tokenize(s)  # slow path handles them


# --- analyze_batch (vectorized builder tokenizer) parity ---

def _batch_equals_perdoc(texts, mode="index"):
    import numpy as np

    counts, terms, pos = tk.analyze_batch(texts, "marlin", mode)
    off = 0
    assert len(counts) == len(texts)
    for i, t in enumerate(texts):
        expect = tk.tokenize(t, mode) if t else []
        got = list(zip(terms[off:off + counts[i]].tolist(),
                       pos[off:off + counts[i]].tolist()))
        assert got == expect, (t, got, expect)
        off += counts[i]
    assert off == terms.size == pos.size


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=120), max_size=8))
def test_analyze_batch_equals_perdoc(texts):
    _batch_equals_perdoc(texts, "index")
    _batch_equals_perdoc(texts, "search")


def test_analyze_batch_mixed_fast_slow():
    texts = [
        "hello world. the quick brown fox",
        "u.s.a. merges to usa",          # abbreviation -> slow
        "don't stop",                     # apostrophe -> slow
        "state-of-the-art hyphens",       # hyphen concat -> slow
        "café au lait",              # unicode -> slow
        "",                               # empty
        "plain tokens only here",
        "x" * 200,                        # 127-cap -> slow
    ]
    _batch_equals_perdoc(texts, "index")
    _batch_equals_perdoc(texts, "search")


def test_analyze_batch_sentence_periods_stay_fast():
    # multi-char tokens followed by '.' are plain separators: no bail
    assert tk._BATCH_BAIL.search("hello world. next sentence.") is None
    # single-char token + '.' must bail (abbreviation merge)
    assert tk._BATCH_BAIL.search("u.s.a.") is not None
    assert tk._BATCH_BAIL.search("see a. b") is not None


def test_ascii_medium_path_equals_full_normalize():
    """The tokenize() ASCII medium path (skip normalize, just lower)
    must be byte-identical to the full unicodedata normalize pipeline on
    every string over _ASCII_NORM_SET — including the special-cased
    hyphen/apostrophe/abbreviation inputs that bail the batch guard."""
    import string

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from marlin_spark.oracle import tokenizer as tk

    alphabet = sorted(tk._ASCII_NORM_SET)

    def forced_slow(text, mode):
        # same loop, normalize forced (guard disabled via a shrunk set)
        orig = tk._ASCII_NORM_SET
        tk._ASCII_NORM_SET = frozenset()
        try:
            return tk.tokenize(text, mode)
        finally:
            tk._ASCII_NORM_SET = orig

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=60), st.sampled_from(["index", "search"]))
    def check(s, mode):
        assert tk.tokenize(s, mode) == forced_slow(s, mode)

    check()
    # targeted quirk inputs
    for s in ("U.S.A. don't - state-of-the-art", "a-b-", "I'm A.B.c", "x" * 200):
        for mode in ("index", "search"):
            assert tk.tokenize(s, mode) == forced_slow(s, mode)
