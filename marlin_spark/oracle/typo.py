"""Typo (fuzzy) matching semantics of the reference engine.

The reference walks its trie with a banded Damerau-Levenshtein DP
(node_lev/lookup_typo, /root/reference/src/main/dtrie.c:702-791):
- maxdist by query length: 0 if len<=3, 1 if 4..7, 2 if >7
  (dtrie.c:766-770);
- restricted Damerau (optimal string alignment: adjacent transposition
  counts 1, no substring re-use);
- in prefix mode (PREFIX_LAST), once the walk depth reaches the query
  length the whole subtree matches — equivalently a term T matches if
  ANY prefix of T is within maxdist of the query.

Pinned by the levenshtein.robot goldens: over the corpus
[test best atest testa tset etst tets tesg tset tast tegt],
btest->4, atest->3, tes->3 (prefix), te->5 (prefix), t->8 (prefix)
(/root/reference/test/robot/levenshtein.robot:24-92).
"""

from __future__ import annotations


def maxdist(word_len: int) -> int:
    if word_len <= 3:
        return 0
    if word_len <= 7:
        return 1
    return 2


def osa_distance(a: str, b: str, cutoff: int = 10) -> int:
    """Restricted Damerau-Levenshtein (optimal string alignment)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cutoff:
        return cutoff + 1
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                v = min(v, prev2[j - 2] + 1)  # type: ignore[index]
            cur[j] = v
        prev2, prev = prev, cur
        if min(prev) > cutoff:
            return cutoff + 1
    return prev[lb]


def term_matches(query: str, term: str, prefix: bool, d: int | None = None) -> bool:
    """Does dictionary ``term`` match ``query`` under the reference's
    typo semantics? (prefix mode: any prefix of term within maxdist)."""
    if d is None:
        d = maxdist(len(query))
    if not prefix:
        return osa_distance(query, term, d) <= d
    # prefix mode: minimum over prefixes; prefixes shorter than
    # len(query)-d cannot be within d
    lo = max(1, len(query) - d)
    for plen in range(lo, len(term) + 1):
        if osa_distance(query, term[:plen], d) <= d:
            return True
    return False


def expand_typo(query: str, vocabulary, prefix: bool = True) -> list[str]:
    """All vocabulary terms matching ``query`` with typos (+ prefix)."""
    d = maxdist(len(query))
    return sorted(t for t in vocabulary if term_matches(query, t, prefix, d))
