"""Deduplication operators (training-data pipeline, first-class API).

All candidate generation is by inverted join (shared shingle / shared
LSH bucket / equal hash) — never an unblocked cross join — so every
operator here survives a 100x scale-up: work is proportional to
collisions, not to corpus^2. Oracle-pinned fixed-parameter forms of
these live in entry_queries.py (DuckDB-verified).

Exact near-dup semantics:
- exact_duplicates: byte-identical text groups (md5 groupBy).
- fingerprint_duplicates: whitespace/case-normalized md5 groups.
- ngram_jaccard_pairs: word n-gram shingle Jaccard >= threshold.
- minhash_lsh_pairs: MinHash signatures -> banded LSH buckets ->
  candidate pairs -> exact Jaccard verification.
- simhash_pairs: 32-bit SimHash, banded by hash prefix, Hamming <= d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingles(
    docs: DataFrame, id_col: str, text_col: str, n: int, max_df: int | None = None
) -> DataFrame:
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.expr(f"filter(split(lower({text_col}), '[^a-z0-9]+'), t -> t <> '')").alias(
            "toks"
        ),
    )
    # array_distinct BEFORE the explode: within-doc repeat shingles never
    # reach the distinct's exchange (shuffle fewer bytes); the .distinct()
    # stays because id_col is not guaranteed unique across input rows
    sh = toks.select(
        "_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"CASE WHEN size(toks) >= {n} THEN "
                    f"transform(sequence(1, size(toks) - {n - 1}), "
                    f"i -> concat_ws(' ', slice(toks, i, {n}))) "
                    "ELSE CAST(array() AS array<string>) END"
                )
            )
        ).alias("s"),
    ).distinct()
    if max_df is not None:
        # HOT-SHINGLE CAP: a shingle shared by >max_df docs contributes a
        # quadratic (df^2) reducer to the pair join — one viral shingle
        # ("of the and", boilerplate headers) kills the stage at scale.
        # Dropping it bounds every reducer at max_df^2. Recall impact:
        # pairs are then measured on the surviving shingle sets; a shingle
        # this common carries ~zero near-dup signal (it distinguishes
        # nothing), the standard trade in web-scale dedup pipelines.
        # The cap is a window count over s — ONE exchange, whose hash
        # partitioning (and sort) the downstream pair self-join reuses —
        # instead of groupBy(s) + join-back (two exchanges). A hot
        # shingle's rows land on one reducer either way, and the cap
        # drops exactly those keys.
        from pyspark.sql import Window

        sh = (
            sh.withColumn("_df", F.count("*").over(Window.partitionBy("s")))
            .filter(F.col("_df") <= max_df)
            .select("_id", "s")
        )
    return sh


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(hash, n, first_id) per group of byte-identical texts, n > 1."""
    return (
        docs.groupBy(F.expr(f"md5({text_col})").alias("h"))
        .agg(F.count("*").alias("n"), F.min(id_col).alias("first_id"))
        .filter(F.col("n") > 1)
    )


def fingerprint_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    norm = f"md5(trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')))"
    return (
        docs.groupBy(F.expr(norm).alias("fp"))
        .agg(F.count("*").alias("n"), F.min(id_col).alias("first_id"))
        .filter(F.col("n") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Pairs (a, b, jaccard) with word-n-gram Jaccard >= threshold.
    max_shingle_df caps hot shingles before the self-join (see _shingles);
    None disables the cap (exact, but unsafe on skewed corpora)."""
    sh = _shingles(docs, id_col, text_col, n, max_df=max_shingle_df)
    cnt = sh.groupBy("_id").agg(F.count("*").alias("n"))
    x, y = sh.alias("x"), sh.alias("y")
    pr = (
        x.join(y, (F.col("x.s") == F.col("y.s")) & (F.col("x._id") < F.col("y._id")))
        .groupBy(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    ca = cnt.select(F.col("_id").alias("a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("_id").alias("b"), F.col("n").alias("nb"))
    j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pr.join(ca, "a").join(cb, "b")
        .filter(j >= threshold)
        .select("a", "b", j.alias("jaccard"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """shingle -> minhash -> band -> bucket-join -> verified Jaccard.

    With r = band_size, b = n_hashes/r bands, the S-curve threshold is
    ~(1/b)^(1/r); tune n_hashes/band_size to the target threshold.
    max_shingle_df caps hot shingles (see _shingles)."""
    sh = _shingles(docs, id_col, text_col, shingle_n, max_df=max_shingle_df)
    # all n_hashes minhashes in ONE map-side-combinable aggregation (one
    # shuffle of n_hashes-column partials) instead of the crossJoin row
    # explosion + groupBy(_id, h) + collect_list band re-aggregation —
    # ~n_hashes x less shuffled data, byte-identical signatures (the
    # literal f"{h}|" prefix equals the old concat(cast(h AS STRING),'|'))
    sigs = sh.groupBy("_id").agg(
        *[
            F.min(F.expr(f"md5(concat('{h}|', s))")).alias(f"sig{h}")
            for h in range(n_hashes)
        ]
    )
    # band b covers hash columns [b*r, min((b+1)*r, n_hashes)) — a
    # trailing partial band when band_size does not divide n_hashes,
    # exactly like the old int(h / band_size) grouping; concat in h
    # order equals the old sort_array(struct(h, sig)) bucket string
    n_bands = (n_hashes + band_size - 1) // band_size
    bands = sigs.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(
                            *[
                                F.col(f"sig{h}")
                                for h in range(
                                    b * band_size,
                                    min((b + 1) * band_size, n_hashes),
                                )
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x._id") < F.col("y._id")),
        )
        .select(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
        .distinct()
    )
    # exact-Jaccard verification on per-doc shingle ARRAYS: two joins of
    # the candidate pairs against (doc -> shingle array, n) plus a narrow
    # array_intersect, instead of the exploded shingle equi-join +
    # groupBy(a, b) + two count joins (5 shuffle stages -> 2 joins).
    # _shingles output is distinct per (_id, s), so |array_intersect| is
    # exactly the exploded join's match count; work remains
    # collision-proportional (only candidate pairs are verified) and
    # per-row state is bounded by doc length.
    kept = sh.groupBy("_id").agg(
        F.collect_list("s").alias("ss"), F.count("*").alias("n")
    )
    ja = kept.select(
        F.col("_id").alias("a"), F.col("ss").alias("sa"), F.col("n").alias("na")
    )
    jb = kept.select(
        F.col("_id").alias("b"), F.col("ss").alias("sb"), F.col("n").alias("nb")
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    j = inter / (F.col("na") + F.col("nb") - inter)
    return (
        cand.join(ja, "a")
        .join(jb, "b")
        .filter(j >= threshold)
        .select("a", "b", j.alias("jaccard"))
    )


def banded_hamming_pairs(
    sim: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 1,
) -> DataFrame:
    """All pairs (a, b, hamming) with Hamming(hash_a, hash_b) <= max_hamming,
    via LSH banding on hash sub-strings — never an unblocked self-join.

    With n_bands bands of bits/n_bands bits each, a pair within Hamming
    distance d differs in at most d bands, so it AGREES on at least
    n_bands - d bands; candidate generation on band equality is therefore
    EXACT (no recall loss) whenever max_hamming < n_bands. The equality
    join hashes on (band_idx, band_val): work is proportional to bucket
    collisions, not corpus^2 — the same shape that lets dd_minhash_lsh
    survive a 100x scale-up.
    """
    assert max_hamming < n_bands, "banding is only exact for d < n_bands"
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    h = F.col(hash_col).cast("long")
    bands = sim.select(
        F.col(id_col).alias("_id"),
        h.alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftright(h, band_bits * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bd"),
    ).select("_id", "_h", F.col("bd.bi").alias("bi"), F.col("bd.bv").alias("bv"))
    x, y = bands.alias("x"), bands.alias("y")
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    cand = (
        x.join(
            y,
            (F.col("x.bi") == F.col("y.bi"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x._id") < F.col("y._id")),
        )
        .select(
            F.col("x._id").alias("a"),
            F.col("y._id").alias("b"),
            F.col("x._h").alias("ha"),
            F.col("y._h").alias("hb"),
        )
        # verify BEFORE deduping: the hamming test needs no shuffle, so
        # running it on the raw join output drops far-apart band
        # collisions before the distinct's exchange (a close pair shares
        # several bands, hence the dedupe; filter∘distinct ≡
        # distinct∘filter on these columns)
        .filter(ham <= max_hamming)
        .distinct()
    )
    return cand.select("a", "b", ham.cast("long").alias("hamming"))


def dedup_keep_first(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Remove the higher-id member of every duplicate pair (the greedy
    keep-first policy). NOTE this is NOT transitive: with pairs (A,C)
    and (B,C) it keeps both A and B even though they are both near-dups
    of C. Production pipelines want connected_components below, which
    collapses the whole cluster to one survivor."""
    losers = pairs.select(F.col("b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    dedup_edges: bool = True,
) -> DataFrame:
    """Connected components over the duplicate-pair graph by min-label
    propagation: every node's label converges to the smallest node id
    reachable from it. Returns DataFrame(node, component).

    Scale notes: each iteration is one edges-to-labels join + one
    groupBy-min — both shuffle on the node id, map-side combinable.
    Iteration count is bounded by the largest cluster's DIAMETER, not
    its size; near-dup clusters are dense (star/clique-ish), so 3-5
    iterations settle real corpora. Each iteration runs as exactly ONE
    job: the convergence signal (count of labels that still improved)
    rides the label aggregation as an Observation instead of a separate
    join+count job. Intermediate labels are persisted; every
    ``checkpoint_every`` iterations the lineage is truncated — with a
    RELIABLE checkpoint when a checkpoint dir is configured
    (``checkpoint_dir`` arg or a pre-set sc.setCheckpointDir: the
    fault-tolerant contract a 100-TB pair graph needs, since
    localCheckpoint dies with its executor), else with localCheckpoint.
    Raises if max_iter rounds do not converge rather than returning a
    partial closure.

    Beyond-reference op (the reference has no dedup); the iterative
    hash-to-min shape follows the standard CC-over-MapReduce literature.
    """
    from pyspark.sql import Observation
    from pyspark.storagelevel import StorageLevel

    sc = pairs.sparkSession.sparkContext
    if checkpoint_dir is not None:
        sc.setCheckpointDir(checkpoint_dir)
    reliable = sc._jsc.sc().getCheckpointDir().isDefined()

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(
            eager=True
        )

    edges = pairs.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
    )
    both = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # dedup_edges=False lets a caller whose pairs are already unique
    # (e.g. the output of a groupBy) skip a full shuffle: min-label
    # propagation is correct with duplicate edges (min is idempotent and
    # the convergence count is per NODE, after the groupBy) — the
    # distinct only bounds join-output inflation on duplicate-heavy
    # inputs. The directed union itself cannot introduce duplicates
    # when pairs are unique with a < b.
    edges = _cut(both.distinct() if dedup_edges else both)
    # initial labels stay LAZY: one distinct over the checkpointed edges,
    # computed inside iteration 0's job — an eager checkpoint here cost
    # its own job + a second materialization of the node set for nothing
    # (labels is replaced after the first iteration)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    pinned: list[DataFrame] = []
    for it in range(max_iter):
        prop = edges.join(
            labels, edges["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), "component")
        # tag the incumbent label so the change count needs no re-join:
        # every node has exactly one _old row, min-over-old = incumbent
        u = labels.select(
            "node", "component", F.lit(True).alias("_old")
        ).unionAll(prop.select("node", "component", F.lit(False).alias("_old")))
        obs = Observation(f"cc_changed_{it}")
        agg = (
            u.groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("_old"), F.col("component"))).alias("_prev"),
            )
            .observe(
                obs,
                F.sum(
                    (F.col("component") < F.col("_prev")).cast("long")
                ).alias("changed"),
            )
        )
        new_labels = agg.select("node", "component")
        if (it + 1) % checkpoint_every == 0:
            new_labels = _cut(new_labels)  # materializes; fills the Observation
        else:
            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
            pinned.append(new_labels)
            new_labels.count()  # the iteration's one job; fills the Observation
        changed = int(obs.get["changed"] or 0)
        labels = new_labels
        if changed == 0:
            for df in pinned:
                if df is not labels:
                    df.unpersist()
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "(pathological chain-shaped duplicate graph?)"
    )
