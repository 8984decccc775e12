"""Text near-dup detection: MinHash → LSH bands → verified Jaccard.

Training-data pipeline operator (first-class per the build brief).  The
full pipeline over a corpus df(id, text):

  1. per-doc word 3-shingles and MinHash signature — entirely row-local
     (array_min over transform): ZERO shuffle;
  2. LSH band keys (md5 of signature slices) — candidate pairs are docs
     sharing any band key: the ONLY shuffle is the band-key self-join,
     whose fan-out is Σ bucket² ≪ N² for spread signatures;
  3. exact word-set Jaccard verification on the candidates (integer
     counting, one division) — kills LSH false positives.

Exact duplicate detection (md5 groupBy) is `queries.dedup_exact`;
SimHash is `queries.dedup_simhash`; embedding near-dup is
`operators/similarity.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MINHASH_K = 12
BANDS = 4  # rows per band = MINHASH_K // BANDS
_P = 2147483647  # Mersenne prime 2^31-1
_A = [131071, 524287, 8191, 1048573, 262139, 65521,
      2097143, 4194301, 524269, 999983, 131063, 65519]
_B = [7, 101, 9001, 12345, 31337, 271, 17, 4099, 90001, 333667, 57, 7919]


def minhash_signatures(df: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """df → (id, band0..band{BANDS-1}); row-local, no shuffle.

    One md5 per shingle + K universal-hash mixes (mh_j = (A_j*h+B_j) mod p)
    instead of K md5 passes.  The word array is pre-projected — a split()
    referenced inside a higher-order lambda re-evaluates per element
    (lambdas are interpreted), which dominated the round-1 cost.
    """
    w = F.col("_w")
    base = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("_w")
    ).filter(F.size("_w") >= 3)
    sh = F.transform(
        F.sequence(F.lit(1), F.size(w) - 2),
        lambda i: F.concat_ws(
            "_", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
        ),
    )
    hs = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % _P
    )
    t = base.select("id", hs.alias("hs"))

    def _mix(j):  # factory, NOT a j=j default (2-arg lambdas get (elem, idx))
        return lambda h: (_A[j] * h + _B[j]) % _P

    sig = t.select(
        "id", *[F.array_min(F.transform(F.col("hs"), _mix(j))).alias(f"mh{j}")
                for j in range(MINHASH_K)]
    )
    r = MINHASH_K // BANDS
    bands = [
        F.md5(F.concat_ws("_", *[F.col(f"mh{b * r + i}") for i in range(r)])).alias(f"band{b}")
        for b in range(BANDS)
    ]
    return sig.select("id", *bands)


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Docs sharing any band key → (a_id, b_id) with a_id < b_id."""
    stacked = _stack_bands(signatures)
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )


def verified_neardup_pairs(
    df: DataFrame, id_col: str = "id", text_col: str = "text", threshold: float = 0.7
) -> DataFrame:
    """Full pipeline → (a_id, b_id, jaccard) with jaccard >= threshold."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    sigs = minhash_signatures(base)
    cand = lsh_candidate_pairs(sigs)
    words = base.select(
        "id", F.array_distinct(F.split("text", " ")).alias("ws")
    ).withColumn("n", F.size("ws"))
    pairs = (
        cand.join(words.select(F.col("id").alias("a_id"), F.col("ws").alias("wa"),
                               F.col("n").alias("na")), on="a_id")
        .join(words.select(F.col("id").alias("b_id"), F.col("ws").alias("wb"),
                           F.col("n").alias("nb")), on="b_id")
    )
    inter = F.size(F.array_intersect("wa", "wb"))
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return (
        pairs.select("a_id", "b_id", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _stack_bands(signatures: DataFrame) -> DataFrame:
    return signatures.selectExpr(
        "id",
        "stack({n}, {cols}) as (band_idx, band_key)".format(
            n=BANDS, cols=", ".join(f"'{b}', band{b}" for b in range(BANDS))
        ),
    )


def neardup_ids_against(
    new_df: DataFrame, old_df: DataFrame,
    id_col: str = "id", text_col: str = "text", threshold: float = 0.7,
) -> DataFrame:
    """ids in ``new_df`` that near-duplicate ANY ``old_df`` row → (id).

    The cross-corpus variant of the LSH pipeline (incremental dedup: a
    delta deduping against already-exported state).  Both sides compute
    row-local signatures (no shuffle); the ONLY shuffle is the band-key
    join, whose probe side is delta-bounded — the old corpus is scanned,
    never self-joined.  A production deployment persists the old side's
    (id, band_key) and word-set tables incrementally instead of
    recomputing them per increment; the join shape is identical.
    """
    nb = new_df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    ob = old_df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    cand = (
        _stack_bands(minhash_signatures(nb)).alias("a")
        .join(
            _stack_bands(minhash_signatures(ob)).alias("b"),
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band_idx") == F.col("b.band_idx")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )
    words_n = nb.select(
        F.col("id").alias("a_id"),
        F.array_distinct(F.split("text", " ")).alias("wa"),
    ).withColumn("na", F.size("wa"))
    words_o = ob.select(
        F.col("id").alias("b_id"),
        F.array_distinct(F.split("text", " ")).alias("wb"),
    ).withColumn("nb", F.size("wb"))
    pairs = cand.join(words_n, on="a_id").join(words_o, on="b_id")
    inter = F.size(F.array_intersect("wa", "wb"))
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return (
        pairs.filter(jac >= threshold)
        .select(F.col("a_id").alias("id"))
        .distinct()
    )


def connected_components(pairs: DataFrame) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond") over an
    undirected edge list (a_id, b_id) → star mapping (id, root) for every
    NON-ROOT member of each component, with root = the component minimum.

    Converges in O(log n) rounds (vs O(component diameter) for min-label
    propagation — a 64-link dup chain takes ~7 rounds, not 64); each round
    is two groupBy shuffles on node id, nothing driver-resident.  Rounds
    are lineage-truncated with localCheckpoint — without it the iterated
    plan nests ~6 copies of itself per round and Catalyst analysis goes
    exponential (on a cluster with an HDFS checkpoint dir, swap in
    ``checkpoint()`` for executor-loss resilience).
    """
    E = (
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(64):  # safety cap ≫ log2 of any real corpus
        # large-star: every neighbor v > u attaches to min(Γ(u) ∪ {u})
        bidir = E.unionByName(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
        gmin = bidir.groupBy("u").agg(F.min("v").alias("mv"))
        large = (
            bidir.join(gmin, on="u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("cu"), F.least("u", "mv").alias("cv"))
            .filter(F.col("cu") != F.col("cv"))
            .select(F.col("cu").alias("u"), F.col("cv").alias("v"))
            .distinct()
        )
        # small-star: orient u > v; every small neighbor (and u) attaches
        # to the minimum small neighbor
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        smin = oriented.groupBy("u").agg(F.min("v").alias("mv"))
        withm = oriented.join(smin, on="u")
        small = (
            withm.select(F.col("v").alias("cu"), F.col("mv").alias("cv"))
            .unionByName(withm.select(F.col("u").alias("cu"), F.col("mv").alias("cv")))
            .filter(F.col("cu") != F.col("cv"))
            .select(F.col("cu").alias("u"), F.col("cv").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        # fixpoint: the star edge set stopped changing (set equality via
        # count + one-sided difference)
        n_new = small.count()
        stable = n_new == E.count() and small.exceptAll(E).limit(1).count() == 0
        E = small
        if stable:
            break
    return E.select(F.col("u").alias("id"), F.col("v").alias("root"))


def dedup_keep_first(df: DataFrame, id_col: str = "id", text_col: str = "text",
                     threshold: float = 0.7) -> DataFrame:
    """Drop near-duplicates, keeping the smallest id of each dup cluster
    (single-link over verified pairs + distributed connected components)."""
    pairs = verified_neardup_pairs(df, id_col, text_col, threshold).persist()
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    non_roots = connected_components(pairs).select("id")
    out = base.join(non_roots, on="id", how="left_anti")
    pairs.unpersist()
    return out
