"""Highlight / snippet generation over the top-k page (SURVEY.md §2.2).

The reference re-tokenizes each hit's display text with char offsets and
wraps matched words (/root/reference/src/main/highlight.c, applied
query.c:189-310). Here highlighting runs over AT MOST max_hits (1000)
hydrated rows — driver-side pure Python on the collected page, never a
distributed operation (the reference likewise highlights only the
returned page)."""

from __future__ import annotations

import re

from marlin_spark.oracle.tokenizer import analyze

# a "display word" keeps inner hyphens/apostrophes so hyphenated words
# highlight as one unit (their analyzed emission includes the concat)
_WORDISH = re.compile(r"\w+(?:[-']\w+)*", re.UNICODE)


def highlight_text(
    text: str,
    matched_terms: set[str],
    analyzer: str = "marlin",
    pre: str = "<em>",
    post: str = "</em>",
) -> str:
    """Wrap every raw word whose analyzed form hits ``matched_terms``.

    Hyphenated raw words match if any emitted part or the concatenation
    matches (mirrors the analyzer's dual emission)."""
    def repl(m: re.Match) -> str:
        raw = m.group(0)
        emitted = {t for t, _ in analyze(raw, analyzer, mode="index")}
        if emitted & matched_terms:
            return f"{pre}{raw}{post}"
        return raw

    return _WORDISH.sub(repl, text)


def snippet(
    text: str,
    matched_terms: set[str],
    analyzer: str = "marlin",
    window: int = 12,
    pre: str = "<em>",
    post: str = "</em>",
) -> str:
    """Highlighted window of ~``window`` words around the first match."""
    words = text.split()
    hit = 0
    for i, w in enumerate(words):
        emitted = {t for t, _ in analyze(w, analyzer, mode="index")}
        if emitted & matched_terms:
            hit = i
            break
    start = max(0, hit - window // 2)
    frag = " ".join(words[start : start + window])
    out = highlight_text(frag, matched_terms, analyzer, pre, post)
    if start > 0:
        out = "… " + out
    if start + window < len(words):
        out = out + " …"
    return out
