"""The reference's rank cascade: typos / proximity / field / position /
exact, plus sortBy / rankBy and per-hit explain.

Reference mapping:
- term generation incl. prefix/typo flags: query.c:489-603
  (n=1 -> [w1]; n=2 -> [w1, w2, w1w2]; n>2 -> [w1, w1w2, w2, ..., wn,
  comb]; typos only on word terms longer than LEVLIMIT=3, prefix on the
  last word / last pair / combined under PREFIX_LAST);
- per-doc feature extraction: docrank.c:63-368 (rank_single_term /
  rank_three_terms / rank_many_terms) — reproduced in the kernel below;
- comparator cascade: sort.c:46-100 (__sort_lt over the rule list;
  default rules sort.c:8 = typos asc, proximity asc, field asc, position
  asc, exact desc), with sortBy prepending and rankBy appending the
  numeric compare rule (index.c:1134-1148);
- goldens: test/robot/rank.robot:44-100 `_explain` values, reproduced in
  tests/test_rank_cascade.py.

Execution shape: one pruned postings scan of every expansion term,
repartitioned by doc range so each matched doc's full term/position view
sits in one partition; features are assembled with pandas groupby
(typos/exact/position/coverage) and a per-candidate two-pointer pass for
proximity — the same per-doc work the reference does natively
(docrank.c:289-323), run only on docs that survived the match filter.
This is the PARITY rank mode; BM25 block-max WAND remains the
throughput path.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd  # noqa: F401 — resolves stringified UDF type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_RULES = ["typos", "proximity", "field", "position", "exact"]

RANK_SCHEMA = (
    "docid long, typos int, proximity int, field int, position int, exact int"
)


@dataclass
class TermSpec:
    text: str
    prefix: bool
    maxdist: int
    kind: str  # 'word' | 'concat' | 'comb'
    widx: int  # word index ('word'/'concat'); -1 for 'comb'


def generate_term_specs(
    words: list[str], prefix_last: bool = True, typos_ok: bool = True
) -> list[TermSpec]:
    """query.c:489-603 with PREFIX_LAST + TYPO_OK defaults. LEVLIMIT=3:
    word terms of length <= 3 never typo-expand (maxdist handles the 0
    band, but the reference doesn't even mark them)."""
    from marlin_spark.oracle.typo import maxdist

    def md(w: str) -> int:
        return maxdist(len(w)) if typos_ok and len(w) > 3 else 0

    n = len(words)
    if n == 1:
        return [TermSpec(words[0], prefix_last, md(words[0]), "word", 0)]
    if n == 2:
        return [
            TermSpec(words[0], False, md(words[0]), "word", 0),
            TermSpec(words[1], prefix_last, md(words[1]), "word", 1),
            TermSpec(words[0] + words[1], prefix_last, 0, "comb", -1),
        ]
    specs: list[TermSpec] = []
    for i, w in enumerate(words):
        specs.append(
            TermSpec(w, prefix_last and i == n - 1, md(w), "word", i)
        )
        if i != n - 1:
            specs.append(
                TermSpec(
                    w + words[i + 1],
                    prefix_last and i + 2 == n,
                    0,
                    "concat",
                    i,
                )
            )
    specs.append(TermSpec("".join(words), prefix_last, 0, "comb", -1))
    return specs


def make_rank_kernel(term_meta: dict, words: list[str], deleted=None):
    """mapInPandas kernel: block rows (term, postings, positions) of every
    expansion term, repartitioned by range_id -> per-doc rank features.

    term_meta: expansion term -> list[(kind, widx, dist, is_exact_word)].
    """
    n_words = len(words)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from marlin_spark.functions.codec import decode_block, decode_positions

        # gather (docid, widx, dist) and (docid, widx, pos) streams
        t_doc, t_widx, t_dist = [], [], []
        p_doc, p_widx, p_pos, p_dist = [], [], [], []
        e_doc, e_widx = [], []  # exact (unmodified word) matches
        c_doc, c_pair = [], []  # concat-term matches force pair prox = 1
        comb_docs = []
        for pdf in batches:
            for term, pb, xb in zip(pdf["term"], pdf["postings"], pdf["positions"]):
                infos = term_meta.get(term)
                if not infos:
                    continue
                docids, tfs, _ = decode_block(bytes(pb))
                docids = docids.astype(np.int64)
                if deleted is not None and deleted.size and docids.size:
                    ii = np.searchsorted(deleted, docids)
                    ii[ii >= deleted.size] = deleted.size - 1
                    keep = deleted[ii] != docids
                    if not keep.all():
                        poss_all = decode_positions(bytes(xb), tfs)
                        pos_keep = np.repeat(keep, tfs.astype(np.int64))
                        docids, tfs = docids[keep], tfs[keep]
                        poss = poss_all[pos_keep]
                    else:
                        poss = decode_positions(bytes(xb), tfs)
                else:
                    poss = decode_positions(bytes(xb), tfs)
                if docids.size == 0:
                    continue
                rep = np.repeat(docids, tfs.astype(np.int64))
                for kind, widx, dist, is_exact in infos:
                    if kind == "comb":
                        comb_docs.append(docids)
                        # combined match zeroes every word's typo count
                        # (docrank.c:258-261) and its positions feed
                        # best_position (filled under slot 0,
                        # term_to_word_idx(num_terms-1)=0, docrank.c:211)
                        for w in range(n_words):
                            t_doc.append(docids)
                            t_widx.append(np.full(docids.size, w, np.int64))
                            t_dist.append(np.zeros(docids.size, np.int64))
                        p_doc.append(rep)
                        p_widx.append(np.zeros(rep.size, np.int64))
                        p_pos.append(poss.astype(np.int64))
                        p_dist.append(np.full(rep.size, dist, np.int64))
                        continue
                    fills = [widx] if kind == "word" else [widx, widx + 1]
                    for fw in fills:
                        p_doc.append(rep)
                        p_widx.append(np.full(rep.size, fw, np.int64))
                        p_pos.append(poss.astype(np.int64))
                        p_dist.append(np.full(rep.size, dist, np.int64))
                    if kind == "concat":
                        c_doc.append(docids)
                        c_pair.append(np.full(docids.size, widx, np.int64))
                    if kind == "word":
                        t_doc.append(docids)
                        t_widx.append(np.full(docids.size, widx, np.int64))
                        t_dist.append(np.full(docids.size, dist, np.int64))
                        if is_exact:
                            e_doc.append(docids)
                            e_widx.append(np.full(docids.size, widx, np.int64))
                    else:  # concat pair: dist to widx, 0 to widx+1
                        for fw, dd in ((widx, dist), (widx + 1, 0)):
                            t_doc.append(docids)
                            t_widx.append(np.full(docids.size, fw, np.int64))
                            t_dist.append(np.full(docids.size, dd, np.int64))
        empty = pd.DataFrame(
            {
                "docid": pd.Series([], dtype="int64"),
                "typos": pd.Series([], dtype="int32"),
                "proximity": pd.Series([], dtype="int32"),
                "field": pd.Series([], dtype="int32"),
                "position": pd.Series([], dtype="int32"),
                "exact": pd.Series([], dtype="int32"),
            }
        )
        if not p_doc and not comb_docs:
            yield empty
            return
        comb = (
            np.unique(np.concatenate(comb_docs)) if comb_docs else
            np.empty(0, np.int64)
        )
        if p_doc:
            P = pd.DataFrame(
                {
                    "d": np.concatenate(p_doc),
                    "w": np.concatenate(p_widx),
                    "p": np.concatenate(p_pos),
                    "dist": np.concatenate(p_dist),
                }
            )
            P = P.groupby(["d", "w", "p"], as_index=False)["dist"].min()
        else:
            P = pd.DataFrame(
                {"d": [], "w": [], "p": [], "dist": []}, dtype="int64"
            )
        T = pd.DataFrame(
            {
                "d": np.concatenate(t_doc),
                "w": np.concatenate(t_widx),
                "v": np.concatenate(t_dist),
            }
        )
        tmin = T.groupby(["d", "w"])["v"].min().unstack(fill_value=255)
        for w in range(n_words):
            if w not in tmin.columns:
                tmin[w] = 255
        tmin = tmin[[w for w in range(n_words)]]
        # match filter: every word slot covered (group OR), or combined
        covered = (tmin < 255).all(axis=1)
        docs = tmin.index.to_numpy()[covered.to_numpy()]
        docs = np.union1d(docs, comb)
        if docs.size == 0:
            yield empty
            return
        dset = pd.Index(docs)
        tsel = tmin.reindex(dset, fill_value=255).clip(upper=255)
        # combined matches force typos 0 on every slot (already emitted as
        # dist-0 rows above, so tsel rows for comb docs are 0)
        typos = tsel.sum(axis=1).to_numpy()

        exact = np.zeros(docs.size, np.int64)
        if e_doc:
            E = pd.DataFrame(
                {"d": np.concatenate(e_doc), "w": np.concatenate(e_widx)}
            ).drop_duplicates()
            ecnt = E.groupby("d")["w"].nunique()
            ecnt = ecnt.reindex(dset, fill_value=0)
            exact = ecnt.to_numpy()

        # positions are stored PACKED as (field_priority << 16) | pos
        # (IDPRIORITY, sindex.c:697-701); best_position's min over packed
        # values prefers lower field then lower position, and field /
        # position unpack from it (docrank.c:182-184)
        best_packed = np.full(docs.size, 0xFFFFFFFF, np.int64)
        prox = np.zeros(docs.size, np.int64)
        if not P.empty:
            psel = P[P["d"].isin(dset)]
            if n_words == 1:
                # rank_single_term (docrank.c:63-111): position tracks the
                # MIN-DIST matches only — a better-typo match resets it
                dmin = psel.groupby("d")["dist"].min()
                flt = psel[psel["dist"].to_numpy() == dmin.reindex(psel["d"]).to_numpy()]
                best = flt.groupby("d")["p"].min().reindex(dset)
            else:
                best = psel.groupby("d")["p"].min().reindex(dset)
            best_packed = best.fillna(0xFFFFFFFF).to_numpy().astype(np.int64)
            if n_words > 1:
                # per-doc sorted position lists per word (docrank.c:289-323)
                comb_set = set(comb.tolist())
                # a concat-term match pins its pair's proximity to 1
                # (docrank.c:272-274 proximity[widx] = 1)
                concat_pairs = set()
                if c_doc:
                    concat_pairs = set(
                        zip(
                            np.concatenate(c_doc).tolist(),
                            np.concatenate(c_pair).tolist(),
                        )
                    )
                lists: dict = {}
                psorted = psel.sort_values(["d", "w", "p"])
                for (dd, ww), grp in psorted.groupby(["d", "w"]):
                    lists[(dd, ww)] = grp["p"].to_numpy()
                for i, dd in enumerate(docs):
                    if dd in comb_set:
                        prox[i] = n_words - 1
                        continue
                    total = 0
                    for x in range(n_words - 1):
                        if (dd, x) in concat_pairs:
                            total += 1
                            continue
                        a = lists.get((dd, x))
                        b = lists.get((dd, x + 1))
                        mindiff = 8
                        if a is not None and b is not None:
                            ia = ib = 0
                            while ia < a.size and ib < b.size:
                                diff = abs(int(a[ia]) - int(b[ib]))
                                if diff != 0 and diff < mindiff:
                                    mindiff = diff
                                    if mindiff == 1:
                                        break
                                if a[ia] > b[ib]:
                                    ib += 1
                                else:
                                    ia += 1
                        total += mindiff
                    prox[i] = total
        yield pd.DataFrame(
            {
                "docid": docs,
                "typos": typos.astype("int32"),
                "proximity": prox.astype("int32"),
                "field": (best_packed >> 16).clip(0, 0xFF).astype("int32"),
                "position": (best_packed & 0xFFFF).astype("int32"),
                "exact": exact.astype("int32"),
            }
        )

    return kernel


def order_by_rules(
    df: DataFrame, rules: list[str], ascending_compare: bool = False
) -> DataFrame:
    """sort.c:46-100 comparator as a Catalyst sort; docid asc is the
    deterministic final tie-break (the reference's combsort leaves ties
    in bmap = docid order)."""
    cols = []
    for r in rules:
        if r in ("typos", "proximity", "field", "position"):
            cols.append(F.asc(r))
        elif r == "exact":
            cols.append(F.desc(r))
        elif r == "compare":
            cols.append(F.asc("compare") if ascending_compare else F.desc("compare"))
        else:
            raise ValueError(f"unknown rank rule {r!r}")
    cols.append(F.asc("docid"))
    return df.orderBy(*cols)
