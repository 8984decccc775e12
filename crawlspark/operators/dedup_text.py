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


def minhash_signatures(df: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """df → (id, band0..band{BANDS-1}); row-local, no shuffle."""
    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(words) - 2)
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            "_", F.element_at(words, i), F.element_at(words, i + 1), F.element_at(words, i + 2)
        ),
    )
    t = df.filter(F.size(words) >= 3).select(F.col(id_col).alias("id"), sh.alias("sh"))

    def mh(j: int):
        prefix = f"{j}:"
        return F.array_min(F.transform(F.col("sh"), lambda s: F.md5(F.concat(F.lit(prefix), s))))

    sig = t.select("id", *[mh(j).alias(f"mh{j}") for j in range(MINHASH_K)])
    r = MINHASH_K // BANDS
    bands = [
        F.md5(F.concat(*[F.col(f"mh{b * r + i}") for i in range(r)])).alias(f"band{b}")
        for b in range(BANDS)
    ]
    return sig.select("id", *bands)


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Docs sharing any band key → (a_id, b_id) with a_id < b_id."""
    stacked = signatures.selectExpr(
        "id",
        "stack({n}, {cols}) as (band_idx, band_key)".format(
            n=BANDS, cols=", ".join(f"'{b}', band{b}" for b in range(BANDS))
        ),
    )
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


def dedup_keep_first(df: DataFrame, id_col: str = "id", text_col: str = "text",
                     threshold: float = 0.7) -> DataFrame:
    """Drop near-duplicates, keeping the smallest id of each dup cluster
    (single-link via pairs; at corpus scale run connected components —
    here the transitive step is iterated min-propagation)."""
    pairs = verified_neardup_pairs(df, id_col, text_col, threshold).persist()
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    # min-label propagation to a FIXPOINT: each round advances the min id
    # one hop (Bellman-Ford), so iterate until no label changes (capped at
    # 32 rounds — dup-cluster diameters beyond that don't occur in text
    # dedup; the cap guards against pathological inputs, not correctness)
    rep = base.select("id", F.col("id").alias("root")).persist()
    edges = pairs.select("a_id", "b_id").unionByName(
        pairs.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    ).persist()
    for _ in range(32):
        prop = (
            edges.join(rep.withColumnRenamed("id", "b_id"), on="b_id")
            .groupBy(F.col("a_id").alias("id"))
            .agg(F.min("root").alias("nroot"))
        )
        new_rep = (
            rep.join(prop, on="id", how="left")
            .select("id", F.least(F.col("root"), F.coalesce("nroot", F.col("root"))).alias("root"))
            .persist()
        )
        changed = (
            new_rep.alias("n")
            .join(rep.alias("o"), on="id")
            .filter(F.col("n.root") != F.col("o.root"))
            .limit(1)
            .count()
        )
        rep.unpersist()
        rep = new_rep
        if changed == 0:
            break
    keep = rep.filter(F.col("id") == F.col("root")).select("id")
    out = base.join(keep, on="id", how="left_semi")
    pairs.unpersist()
    return out
