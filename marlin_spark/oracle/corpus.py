"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Schema is exactly the BASELINE.json input_hint:
(conv_id string, turn_idx int, role string, text string, tool string|null,
 ts timestamp). Generation is seed-stable per (seed, conv, turn) so any
row can be regenerated independently — that is what lets the bench
generate 10^6+ turns *distributed* (spark.range -> mapInPandas calling
``turn_record``) with zero driver-side data movement, and what guarantees
the per-turn text equality invariant.

Vocabulary is Zipf-distributed (head-term skew is real, exercising the
salting path) with embedded analyzer edge-case tokens and fixture
sentences ported from the reference robot tests
(/root/reference/test/robot/{rank,terms,levenshtein}.robot).
"""

from __future__ import annotations

import datetime as _dt
import random
import zlib
from typing import Iterator

SEED = 42

_CONSONANTS = "bcdfghklmnprstvz"
_VOWELS = "aeiou"


def _build_vocab(n: int = 1200) -> list[str]:
    words = []
    rng = random.Random(SEED)
    seen = set()
    while len(words) < n:
        nsyl = rng.randint(1, 4)
        w = "".join(
            rng.choice(_CONSONANTS) + rng.choice(_VOWELS) for _ in range(nsyl)
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


VOCAB = _build_vocab()

# Zipf weights: P(rank r) ~ 1/(r+1)
_CUM: list[float] = []
_total = 0.0
for _r in range(len(VOCAB)):
    _total += 1.0 / (_r + 1.0)
    _CUM.append(_total)
ZIPF_TOTAL = _total

EDGE_TOKENS = [
    "U.S.A.",
    "don't",
    "state-of-the-art",
    "Café",
    "MÜNSTER",
    "naïve",
    "ｆｕｌｌｗｉｄｔｈ",
    "x" * 140,  # >127-char token: dropped by the analyzer
]

FIXTURE_SENTENCES = [
    # rank fixture (/root/reference/test/robot/rank.robot:24-33)
    "this is worst",
    "this is best",
    "this best worst",
    "testing this",
    "test",
    # terms fixture (/root/reference/test/robot/terms.robot:24-55)
    "aaaa",
    "aaaa bbbb",
    "aaaa bbbb cccc",
    "aaaa bbbb cccc dddd",
    "aaaa bbbb cccc dddd eeee",
    "aaaabbbb cccc dddd eeee",
    "aaaa bbbbcccc ddddeeee",
    "aaaabbbbccccddddeeee",
    # levenshtein fixture (/root/reference/test/robot/levenshtein.robot:24-92)
    "test best atest testa tset etst tets tesg tset tast tegt",
]

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = [None, "search", "calculator", "browser", "python", None, None]

_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)


def _rng_for(seed: int, conv: int, turn: int) -> random.Random:
    key = f"{seed}:{conv}:{turn}".encode()
    return random.Random(zlib.crc32(key))


def _zipf_word(rng: random.Random) -> str:
    x = rng.random() * ZIPF_TOTAL
    lo, hi = 0, len(_CUM) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if _CUM[mid] < x:
            lo = mid + 1
        else:
            hi = mid
    return VOCAB[lo]


def turn_text(seed: int, conv: int, turn: int) -> str:
    """Deterministic text of one turn; regenerable in isolation."""
    rng = _rng_for(seed, conv, turn)
    r = rng.random()
    if r < 0.02:
        return FIXTURE_SENTENCES[rng.randrange(len(FIXTURE_SENTENCES))]
    n_words = rng.randint(5, 40)
    words = [_zipf_word(rng) for _ in range(n_words)]
    if r < 0.06:  # sprinkle analyzer edge tokens
        words[rng.randrange(len(words))] = EDGE_TOKENS[
            rng.randrange(len(EDGE_TOKENS))
        ]
    return " ".join(words)


def turn_record(seed: int, conv: int, turn: int) -> dict:
    rng = _rng_for(seed, conv, turn * 7919 + 13)
    role = ROLES[turn % 4] if rng.random() < 0.7 else rng.choice(ROLES)
    tool = rng.choice(TOOLS) if role in ("assistant", "tool") else None
    ts = _EPOCH + _dt.timedelta(
        seconds=conv * 3600 + turn * 60 + rng.randrange(50)
    )
    return {
        "conv_id": f"conv-{conv:08d}",
        "turn_idx": turn,
        "role": role,
        "text": turn_text(seed, conv, turn),
        "tool": tool,
        "ts": ts,
    }


def n_turns_for(seed: int, conv: int, max_turns: int = 8) -> int:
    return 1 + _rng_for(seed, conv, -1).randrange(max_turns)


def generate(n_convs: int, max_turns: int = 8, seed: int = SEED) -> Iterator[dict]:
    for conv in range(n_convs):
        for turn in range(n_turns_for(seed, conv, max_turns)):
            yield turn_record(seed, conv, turn)


def tiny_corpus() -> list[dict]:
    """~130 turns with all fixture sentences force-included as the first
    conversations (one fixture sentence per turn) — golden-test corpus."""
    rows: list[dict] = []
    for i, sent in enumerate(FIXTURE_SENTENCES):
        rows.append(
            {
                "conv_id": "fixture-000",
                "turn_idx": i,
                "role": ROLES[i % 4],
                "text": sent,
                "tool": None,
                "ts": _EPOCH + _dt.timedelta(seconds=i),
            }
        )
    for i, tok in enumerate(EDGE_TOKENS):
        rows.append(
            {
                "conv_id": "fixture-edge",
                "turn_idx": i,
                "role": ROLES[i % 4],
                "text": f"prefix {tok} suffix",
                "tool": "search" if i % 2 else None,
                "ts": _EPOCH + _dt.timedelta(seconds=100 + i),
            }
        )
    rows.extend(generate(24, max_turns=6))
    return rows


def small_corpus(n_convs: int = 400) -> list[dict]:
    """~1.8k turns for rank-identity sweeps."""
    rows = tiny_corpus()
    rows.extend(generate(n_convs, max_turns=8, seed=SEED + 1))
    # re-key to keep (conv_id, turn_idx) unique: generate() with a
    # different seed reuses conv numbers, so prefix them
    out = []
    seen: set[tuple[str, int]] = set()
    for r in rows:
        key = (r["conv_id"], r["turn_idx"])
        if key in seen:
            r = dict(r)
            r["conv_id"] = "b-" + r["conv_id"]
            key = (r["conv_id"], r["turn_idx"])
        seen.add(key)
        out.append(r)
    return out
