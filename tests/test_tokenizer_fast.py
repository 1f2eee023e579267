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
