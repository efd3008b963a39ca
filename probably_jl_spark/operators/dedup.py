"""Deduplication operators for training-data pipelines — exact,
MinHash+LSH, SimHash, n-gram Jaccard. Spark-first design:

* exact dedup shuffles on ``xxhash64(text)`` (8 bytes) rather than the
  raw text, so the exchange stays narrow at 100 TB; the full text rides
  along only for collision safety inside each hash group;
* MinHash signatures are computed entirely in the JVM (shingling +
  per-permutation xxhash64 inside higher-order array functions — zero
  Python, whole-stage codegen); banding + bucket self-join produce
  candidate pairs; exact shingle-Jaccard verification also stays JVM-side
  (array_intersect / array_union);
* SimHash hashes tokens JVM-side (explode + xxhash64), then packs sign
  bits in a vectorized numpy applyInPandas per doc group; near-dup
  candidates via 4x16-bit band equality, verified with bit_count(xor).

Scale notes: every self-join is on a (band, bucket-hash) key whose
cardinality grows with the corpus — no broadcast of the corpus, no
driver-side state; skewed buckets (boilerplate shingles) can be salted
with the same machinery as grouped sketches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adds ``rep_id`` = min id among rows with byte-identical text.
    Shuffle key is the 8-byte text hash; text equality inside the window
    guards against hash collisions."""
    w = Window.partitionBy(F.xxhash64(F.col(text_col)), F.col(text_col))
    return df.withColumn("rep_id", F.min(id_col).over(w))


def shingles(text_col: str, k: int = 5):
    """Distinct character k-shingles as an array column (JVM)."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
            f" i -> substring({text_col}, i, {k}))"
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, sig array<long>[n_hashes]) — sig_j = min over shingles of
    xxhash64(shingle, j). All JVM."""
    sh = shingles(text_col, shingle_k).alias("__sh")

    def perm(j: int):
        # NB: must be a ONE-parameter lambda — PySpark binds a second
        # lambda parameter to the array index, which would silently turn
        # every "permutation" into the same position-dependent hash
        return lambda s: F.xxhash64(s, F.lit(j))

    sig = F.array(
        *[F.array_min(F.transform(F.col("__sh"), perm(j))) for j in range(n_hashes)]
    )
    return df.select(F.col(id_col), sh).select(F.col(id_col), sig.alias("sig"))


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Candidate (id_a, id_b) pairs sharing >= 1 LSH band bucket.
    Explodes each signature into `bands` (band_idx, band_hash) rows and
    self-joins on the bucket — the shuffle ships 16 bytes per band, never
    the documents."""
    bandcols = F.array(
        *[
            F.xxhash64(
                F.concat_ws(",", *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    banded = sig_df.select(F.col(id_col), F.posexplode(bandcols).alias("band", "bucket"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (JVM array ops):
    adds ``jaccard`` double to (id_a, id_b)."""
    sh = df.select(F.col(id_col), shingles(text_col, shingle_k).alias("sh"))
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
    )
    return out.select("id_a", "id_b", "jaccard")


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Full pipeline: MinHash -> LSH bands -> exact-Jaccard verify ->
    pairs with jaccard >= threshold."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    cands = lsh_candidate_pairs(sigs, id_col, bands, n_hashes // bands)
    verified = jaccard_pairs(df, cands, id_col, text_col, shingle_k)
    return verified.filter(F.col("jaccard") >= threshold)


def exact_jaccard_all_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_k: int = 5
) -> DataFrame:
    """Brute-force all-pairs exact Jaccard (small inputs only — the test
    oracle for LSH recall)."""
    sh = df.select(F.col(id_col), shingles(text_col, shingle_k).alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------ SimHash


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash long): 64-bit SimHash over whitespace tokens. Token
    hashing is JVM (explode + xxhash64); the sign-bit fold is vectorized
    numpy per doc group (one applyInPandas, no per-row Python)."""
    tok = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")).alias("tok"),
    ).select(F.col(id_col), F.xxhash64("tok").alias("h"))

    def fold(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                sim |= np.uint64(1) << np.uint64(b)
        return pd.DataFrame([{id_col: keys[0], "simhash": np.int64(sim)}])

    return tok.groupBy(id_col).applyInPandas(fold, schema=f"{id_col} long, simhash long")


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.
    Candidates via 4x16-bit band equality (any equal quarter), verified
    with bit_count(a XOR b) in the JVM."""
    sh = simhash(df, id_col, text_col)
    bandcols = F.array(
        *[F.shiftright(F.col("simhash"), 16 * b).bitwiseAND(F.lit(0xFFFF)) for b in range(4)]
    )
    banded = sh.select(F.col(id_col), F.col("simhash"), F.posexplode(bandcols).alias("band", "chunk"))
    l, r = banded.alias("l"), banded.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sim_a"),
            F.col("r.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
