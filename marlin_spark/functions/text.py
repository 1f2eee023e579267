"""Text-analysis column functions (training-data pipeline, first-class API).

All pure Catalyst — language ID, quality scoring, token counting,
fingerprinting as Column expressions composable into any pipeline.
Oracle-pinned fixed forms live in entry_queries.py (DuckDB-verified)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "of", "and", "a", "is", "in", "to", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "los", "las", "y", "una", "es"],
}


def simple_tokens_col(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")


def stopword_hits(toks: Column, lang: str) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))


def langid_struct(text: Column) -> Column:
    """struct(c_en, c_de, c_fr, c_es, guess) — stopword-argmax heuristic
    with a deterministic priority tie rule (en > de > fr > es)."""
    toks = simple_tokens_col(text)
    counts = {lang: stopword_hits(toks, lang) for lang in STOPWORDS}
    guess = (
        F.when(
            (counts["en"] >= counts["de"])
            & (counts["en"] >= counts["fr"])
            & (counts["en"] >= counts["es"]),
            "en",
        )
        .when((counts["de"] >= counts["fr"]) & (counts["de"] >= counts["es"]), "de")
        .when(counts["fr"] >= counts["es"], "fr")
        .otherwise("es")
    )
    return F.struct(
        *[counts[lang].alias(f"c_{lang}") for lang in ("en", "de", "fr", "es")],
        guess.alias("guess"),
    )


def quality_score(text: Column, n_chars: Column | None = None) -> Column:
    """0.4*stopword_ratio + 0.3*min(n_words/50, 1) + 0.3*alpha_ratio."""
    toks = simple_tokens_col(text)
    n_words = F.size(toks)
    nc = n_chars if n_chars is not None else F.length(text)
    stop_ratio = stopword_hits(toks, "en").cast("double") / n_words
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(text), "[^a-z]", "")).cast("double") / nc
    )
    return F.when(
        n_words > 0,
        0.4 * stop_ratio
        + 0.3 * F.least(n_words / F.lit(50.0), F.lit(1.0))
        + 0.3 * alpha_ratio,
    )


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))


def bpe_ish_token_count(text: Column) -> Column:
    """Letter runs + digit runs + isolated symbols (BPE-ish piece count)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), 0
        )
    )


def fingerprint(text: Column) -> Column:
    """md5 of whitespace-collapsed lowercase text."""
    return F.md5(F.encode(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), "UTF-8"))
