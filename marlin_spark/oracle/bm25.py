"""Single-process inverted index + BM25 oracle (SURVEY.md §7 Phase 0).

This is the rank-identity reference the Spark engine is tested against:
it reuses the exact analyzer (tokenizer.py) and defines the scoring,
matching and tie-break semantics that the distributed engine must
reproduce bit-for-bit at the rank level.

Scoring: Okapi BM25 with k1=1.2, b=0.75 (marlin ships no BM25 constants —
SURVEY.md preamble), Robertson idf = ln((N - df + 0.5)/(df + 0.5) + 1).

Determinism contract shared with the Spark engine:
- docid = 1-based dense rank of (conv_id, turn_idx) in lexicographic order
  (deterministic: the key is unique; reference analog: dense per-shard
  docids, /root/reference/src/main/sdata.c:100-134).
- dl = number of tokens emitted by the index analyzer (includes hyphen
  concatenation emissions).
- a document's score accumulates per-term contributions in sorted unique
  term order (fixed order => reproducible float sum).
- ranking key = (-round(score, 9), docid): scores are rounded to 9 dp
  before ranking so that set-equal float sums that differ only in
  accumulation order cannot flip ranks across engines.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, List, Sequence, Tuple

from marlin_spark.oracle.tokenizer import analyze, tokenize

ROUND_DP = 9


class OracleIndex:
    def __init__(
        self,
        docs: Iterable[Tuple[int, str]],
        analyzer: str = "marlin",
        k1: float = 1.2,
        b: float = 0.75,
    ):
        self.k1 = k1
        self.b = b
        self.analyzer = analyzer
        # term -> docid -> positions (1-based)
        self.postings: Dict[str, Dict[int, List[int]]] = {}
        self.dl: Dict[int, int] = {}
        for docid, text in docs:
            toks = analyze(text, analyzer, mode="index")
            self.dl[docid] = len(toks)
            for term, pos in toks:
                self.postings.setdefault(term, {}).setdefault(docid, []).append(pos)
        self.n_docs = len(self.dl)
        total = sum(self.dl.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0
        self.total_tokens = total

    # --- stats ---
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> float:
        df = self.df(term)
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def term_score(self, term: str, docid: int) -> float:
        plist = self.postings.get(term)
        if not plist or docid not in plist:
            return 0.0
        tf = len(plist[docid])
        dl = self.dl[docid]
        denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        return self.idf(term) * tf * (self.k1 + 1.0) / denom

    # --- query analysis ---
    def query_terms(self, q: str) -> List[str]:
        """Unique query terms in sorted order (fixed accumulation order)."""
        toks = analyze(q, self.analyzer, mode="search")
        return sorted({t for t, _ in toks})

    def expand_prefix(self, prefix: str) -> List[str]:
        return sorted(t for t in self.postings if t.startswith(prefix))

    # --- search ---
    def search(
        self,
        q: str,
        k: int = 10,
        mode: str = "any",
        prefix_last: bool = False,
    ) -> List[Tuple[int, float]]:
        """Top-k BM25. mode='any' (disjunctive, WAND-prunable) or
        mode='all' (conjunctive: doc must contain every query term).

        prefix_last: the last query term additionally matches as a prefix
        (reference PREFIX_LAST default, /root/reference/src/main/query.c:489-603);
        each dictionary expansion scores with its own idf and a doc's
        score counts each matched expansion once.
        """
        ordered = [t for t, _ in analyze(q, self.analyzer, mode="search")]
        terms = sorted(set(ordered))
        if not terms:  # empty query = match all, score 0, docid order
            ids = sorted(self.dl)[:k]
            return [(d, 0.0) for d in ids]
        scoring_terms = list(terms)
        required = list(terms)
        if prefix_last:
            # prefix applies to the last word in QUERY order (reference:
            # query.c generate_query_terms, i == num_words-1), NOT the
            # alphabetically-last after sorting
            last = ordered[-1]
            expanded = self.expand_prefix(last)
            scoring_terms = sorted((set(terms) - {last}) | set(expanded))
            required = [w for w in terms if w != last] + [("PREFIX", last)]  # type: ignore

        scores: Dict[int, float] = {}
        matched: Dict[int, set] = {}
        for t in scoring_terms:
            for docid in self.postings.get(t, {}):
                scores[docid] = scores.get(docid, 0.0) + self.term_score(t, docid)
                matched.setdefault(docid, set()).add(t)

        def ok(docid: int) -> bool:
            if mode != "all":
                return True
            got = matched[docid]
            for r in required:
                if isinstance(r, tuple):  # prefix requirement
                    if not any(g.startswith(r[1]) for g in got):
                        return False
                elif r not in got:
                    return False
            return True

        ranked = sorted(
            ((d, s) for d, s in scores.items() if ok(d)),
            key=lambda ds: (-round(ds[1], ROUND_DP), ds[0]),
        )
        return ranked[:k]

    # --- marlin matching semantics (match set only, no BM25) ---
    def marlin_match(self, q: str, prefix_last: bool = True) -> set:
        """Which docs match, per the reference's term algebra
        (/root/reference/src/main/query.c:489-603 term generation;
        /root/reference/src/main/squery.c:212-277 boolean combine):

        words w1..wn generate terms [w1, w1w2, w2, w2w3, ..., wn] plus the
        all-words concatenation; a doc matches if for every word i it
        contains term 2i-1, 2i or 2i+1 (1-based: the word, a neighbor
        concat), OR it contains the full concatenation. The last term
        matches as a prefix when prefix_last (PREFIX_LAST default). Typo
        (Damerau-Levenshtein) expansion is out of scope (SURVEY.md §2.3).
        """
        words = [t for t, _ in analyze(q, self.analyzer, mode="search")]
        if not words:
            return set(self.dl)
        if len(words) == 1:
            return self._docs_for(words[0], prefix_last)
        terms: List[str] = []
        for i, w in enumerate(words):
            terms.append(w)
            if i + 1 < len(words):
                terms.append(w + words[i + 1])
        combined = "".join(words)
        result: set = set()
        nterms = len(terms)
        for i in range(len(words)):
            group: set = set()
            center = 2 * i  # 0-based index of word i in terms
            for j in (center - 1, center, center + 1):
                if 0 <= j < nterms:
                    is_last = j == nterms - 1
                    group |= self._docs_for(terms[j], prefix_last and is_last)
            result = group if i == 0 else (result & group)
        result |= self._docs_for(combined, prefix_last)
        return result

    def _docs_for(self, term: str, prefix: bool) -> set:
        if not prefix:
            return set(self.postings.get(term, {}))
        out: set = set()
        for t in self.expand_prefix(term):
            out |= set(self.postings[t])
        return out


def assign_docids(rows: Sequence[dict]) -> List[Tuple[int, str]]:
    """docid = 1-based rank of (conv_id, turn_idx); returns (docid, text)."""
    ordered = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
    return [(i + 1, r["text"]) for i, r in enumerate(ordered)]


def phrase_match_oracle(index: "OracleIndex", q: str) -> set:
    """Exact phrase matching from positional postings: doc matches iff
    the query words occur at consecutive positions in order. The
    reference DECLARED a phrase index but never wrote it
    (/root/reference/src/main/sindex.c:718-724 commented out); this
    engine's posting layout stores positions precisely to enable it."""
    from marlin_spark.oracle.tokenizer import analyze

    words = [t for t, _ in analyze(q, index.analyzer, mode="search")]
    if not words:
        return set(index.dl)
    first = index.postings.get(words[0], {})
    out = set()
    for docid, poss in first.items():
        rest = []
        ok_doc = True
        for w in words[1:]:
            plist = index.postings.get(w, {})
            if docid not in plist:
                ok_doc = False
                break
            rest.append(set(plist[docid]))
        if not ok_doc:
            continue
        for p in poss:
            if all((p + i + 1) in rest[i] for i in range(len(rest))):
                out.add(docid)
                break
    return out
