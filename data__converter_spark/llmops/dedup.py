"""Deduplication operators for document corpora.

Five strategies, each with a different cost/recall point (SURVEY §7.1 M6):

- :func:`exact_dedup` — hash-groupBy on content digest. One shuffle on
  a 64-hex key; at 100 TB this is the cheapest and always-first pass.
- :func:`ngram_jaccard_pairs` — exact all-pairs Jaccard on word
  k-grams. O(n²); the correctness oracle for the approximate methods
  (only run it on small candidate sets).
- :func:`minhash_lsh_pairs` — MinHash signatures + banded LSH: shuffle
  on band buckets, Jaccard-verify only within buckets. The scale path:
  cost ~ n * bands, not n².
- :func:`simhash_col` / :func:`simhash_pairs` — 64-bit SimHash with
  banded blocking on 16-bit chunks, Hamming-verified.
- :func:`embedding_pairs` — cosine near-dup over an embedding column.

Everything is DataFrame-native; MinHash permutations use
``xxhash64(shingle, seed_i)`` so signatures are deterministic and need
no fitted model or driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import shingles_col


def exact_dedup(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row (min id) per distinct content digest.

    groupBy on ``sha2(content)`` rather than the raw content so the
    shuffle moves 32-byte keys, not documents."""
    key = F.sha2(F.coalesce(F.col(col).cast("string"), F.lit("")), 256)
    keep = (
        df.select(key.alias("__digest__"), F.col(id_col))
        .groupBy("__digest__")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")


def exact_dup_groups(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Digest groups with >1 member: (digest, n_docs, min/max id)."""
    key = F.sha2(F.coalesce(F.col(col).cast("string"), F.lit("")), 256)
    return (
        df.select(key.alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.max(id_col).alias("max_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact) — the oracle for the approximate strategies
# ---------------------------------------------------------------------------


def _shingle_sets(df: DataFrame, col: str, id_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col), F.array_distinct(shingles_col(col, k)).alias("sh")
    ).filter(F.size("sh") > 0)


def ngram_jaccard_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All pairs (a < b) with word-k-gram Jaccard >= threshold. O(n²)
    crossJoin — correctness baseline, not the scale path."""
    a = _shingle_sets(df, col, id_col, k).select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
    )
    b = _shingle_sets(df, col, id_col, k).select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH — the scale path for near-dup
# ---------------------------------------------------------------------------


def minhash_signature_col(
    col: str | Column = "text", k: int = 3, num_hashes: int = 64, seed: int = 42
) -> Column:
    """MinHash signature: per permutation i, min xxhash64(shingle, seed+i)
    over the doc's shingle set. Pure expression — no fitted model."""
    sh = F.array_distinct(shingles_col(col, k))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.xxhash64(s, i + F.lit(seed)))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified with exact Jaccard.

    Signature of ``num_hashes`` minhashes split into ``bands`` bands of
    r = num_hashes/bands rows; docs colliding on any band hash become
    candidates (p(collide) = 1-(1-j^r)^b). The only wide ops are a
    groupBy-free self-join on band buckets and the final dedup —
    documents never cross-join.
    """
    rows_per_band = num_hashes // bands
    sigs = df.select(
        F.col(id_col),
        F.array_distinct(shingles_col(col, k)).alias("sh"),
        minhash_signature_col(col, k, num_hashes, seed).alias("sig"),
    ).filter(F.size("sh") > 0)

    banded = sigs.select(
        id_col,
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda h: h.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    left = banded.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
    )
    right = banded.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return cand.select("id_a", "id_b", (inter / union).alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def near_dedup(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> DataFrame:
    """Drop near-duplicates: for every LSH-verified pair keep the lower
    id (greedy representative — one extra semi-join, no iterative
    connected components; transitive chains collapse to their min id in
    almost all corpora and the residual is bounded by the pair list)."""
    pairs = minhash_lsh_pairs(df, col, id_col, **lsh_kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_col(col: str | Column = "text", k: int = 2) -> Column:
    """64-bit SimHash over word k-gram features.

    One sequential fold over the feature array with an array<int>
    accumulator: each feature is hashed once (xxhash64) and contributes
    ±1 per bit position; sign bits assemble the final long. Narrow —
    no shuffle, no UDF. Bit indices are plan-time constants
    (``shiftright`` requires a literal shift in Spark).
    """
    feats = F.array_distinct(shingles_col(col, k))

    def contrib(s: Column) -> Column:
        h = F.xxhash64(s)
        return F.array(
            *[
                F.when(
                    F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for j in range(64)
            ]
        )

    counts = F.aggregate(
        feats,
        F.array(*[F.lit(0)] * 64),
        lambda acc, s: F.zip_with(acc, contrib(s), lambda a, c: a + c),
    )
    out = F.lit(0).cast("long")
    for j in range(64):
        bit_val = F.lit(-(2**63) if j == 63 else (1 << j)).cast("long")
        out = out.bitwiseOR(
            F.when(F.element_at(counts, j + 1) > 0, bit_val).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def hamming64_col(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit longs (popcount of xor)."""
    x = a.bitwiseXOR(b)
    bits = [F.shiftright(x, j).bitwiseAND(F.lit(1)).cast("int") for j in range(64)]
    out = bits[0]
    for b_ in bits[1:]:
        out = out + b_
    return out


def simhash_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 2,
    max_distance: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_distance.

    Blocking: split the 64-bit hash into 4 16-bit chunks; by pigeonhole
    any pair within distance 3 shares at least one exact chunk, so the
    join is on (chunk_index, chunk_value) buckets — no cross-join.
    """
    h = df.select(F.col(id_col), simhash_col(col, k).alias("sim"))
    chunks = h.select(
        id_col,
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_i"),
                        F.shiftright(F.col("sim"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_v"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select(id_col, "sim", "c.chunk_i", "c.chunk_v")
    left = chunks.select(
        "chunk_i", "chunk_v", F.col(id_col).alias("id_a"), F.col("sim").alias("sim_a")
    )
    right = chunks.select(
        "chunk_i", "chunk_v", F.col(id_col).alias("id_b"), F.col("sim").alias("sim_b")
    )
    cand = (
        left.join(right, ["chunk_i", "chunk_v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a", "id_b", hamming64_col(F.col("sim_a"), F.col("sim_b")).alias("hamming")
    ).filter(F.col("hamming") <= max_distance)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays, computed in double with a
    sequential fold so results are reproducible across engines."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (na * nb)


def embedding_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs (a<b) with cosine >= threshold. Brute-force baseline;
    at scale route through similarity.lsh_topk's bucketing instead."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    sim = cosine_col(F.col("v_a"), F.col("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
