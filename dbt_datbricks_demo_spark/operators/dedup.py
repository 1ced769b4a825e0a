"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
  * exact_dedup — one hash-partitioned shuffle on the content hash; at
    100 TB hash first (16-byte md5) so the shuffle carries digests, not
    documents.
  * MinHash+LSH — per-row signature computation is pure JVM array math
    (transform/array_min, codegen); the only shuffle is the band-bucket
    self-join, whose input is |docs| × bands tiny (band_hash, doc_id)
    pairs. Candidate pairs are then verified with exact Jaccard. This is
    the standard near-dup pipeline (shingle → minhash → band → bucket
    join) at web scale.
  * SimHash — one 32/64-bit signature per doc; near-dups differ in few
    bits. Signature again pure array math.
  * All hashes derive from md5 (not Spark's xxhash64) so results are
    engine-portable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.operators.text import tokens

MERSENNE31 = 2_147_483_647  # 2^31 - 1, the minhash permutation field


def _affine_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation constants via a fixed LCG."""
    params, x = [], 88172645463325252
    for _ in range(num_hashes):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        a = (x % (MERSENNE31 - 2)) + 1
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        b = x % MERSENNE31
        params.append((a, b))
    return params


def md5_int32(col: Column) -> Column:
    """Portable 32-bit hash: first 8 hex chars of md5 → unsigned int."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def content_hash(*cols: Column | str) -> Column:
    """Digest for exact dedup over one or more columns."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.md5(F.concat_ws("", *[c.cast("string") for c in cs]))


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per distinct content (deterministic winner).
    One shuffle on the 16-byte digest regardless of row width."""
    keyed = df.withColumn("_content_hash", content_hash(*cols))
    winners = keyed.groupBy("_content_hash").agg(F.min(id_col).alias(id_col))
    return keyed.join(winners, on=["_content_hash", id_col], how="inner").drop(
        "_content_hash"
    )


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct character k-shingles of normalized text — the unit set for
    MinHash/Jaccard. Array stays JVM-side."""
    c = F.trim(F.lower(F.col(col) if isinstance(col, str) else col))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(c) - (k - 1))),
            lambda i: c.substr(i, F.lit(k)),
        )
    )


def shingle_hashes(col: Column | str, k: int = 5) -> Column:
    """Each distinct shingle → 31-bit integer (one md5 per shingle)."""
    return F.transform(
        char_shingles(col, k), lambda s: md5_int32(s) % F.lit(MERSENNE31)
    )


def minhash_signature(col: Column | str, num_hashes: int = 8, k: int = 5) -> Column:
    """MinHash signature as an array<bigint> of length num_hashes.

    One md5 per shingle, then cheap affine permutations
    (a*h + b) mod 2^31-1 per hash function — products stay < 2^62, no
    overflow in 64-bit arithmetic on any engine.
    """
    hs = shingle_hashes(col, k)

    def perm(a: int, b: int):
        # closure factory: F.transform inspects lambda arity, so the
        # constants must be captured, not passed as default args
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE31)

    sigs = [
        F.array_min(F.transform(hs, perm(a, b)))
        for a, b in _affine_params(num_hashes)
    ]
    return F.array(*sigs)


def lsh_band_keys(sig_col: Column, bands: int, rows_per_band: int) -> Column:
    """Array of per-band bucket keys: md5 over the band's slice of the
    signature (prefixed with the band index)."""
    keys = []
    for b in range(bands):
        lo = b * rows_per_band
        parts = [F.lit(str(b))] + [
            F.element_at(sig_col, lo + r + 1).cast("string")
            for r in range(rows_per_band)
        ]
        keys.append(F.md5(F.concat_ws("-", *parts)))
    return F.array(*keys)


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b): documents sharing ≥1 band bucket.

    The self-join runs on exploded (band_key, id) pairs — |docs|×bands
    rows of ~50 bytes — so the shuffle is tiny relative to the corpus.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(text_col, num_hashes, k)
    keyed = df.select(
        F.col(id_col), F.explode(lsh_band_keys(sig, bands, rows_per_band)).alias("band_key")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str = "text", k: int = 5
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs, fully relational:
    explode distinct shingle hashes, join on equality, count intersections,
    |A∪B| = |A| + |B| − |A∩B|. Integer-only until the final division."""
    sh = df.select(
        F.col(id_col), F.explode(shingle_hashes(text_col, k)).alias("sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))

    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("set_size", "size_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("set_size", "size_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", "n_common", "size_a", "size_b",
            (
                F.col("n_common")
                * 1.0
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


def simhash32(col: Column | str) -> Column:
    """32-bit SimHash over whitespace tokens: per bit, sum ±1 across token
    hashes; bit set where the sum is positive. Near-duplicate documents
    differ in a small number of bits (compare via Hamming distance)."""
    hs = F.transform(tokens(col), lambda t: md5_int32(t))

    def bit_vote(p: int):
        # h < 2^32 and p = 2^j, so h/p is exact in double; floor-cast
        # recovers the integer quotient (same as h // p)
        return lambda acc, h: acc + F.when(
            ((h / F.lit(p)).cast("bigint") % 2) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("bigint")
    for j in range(32):
        pow2 = 1 << j
        bit_sum = F.aggregate(hs, F.lit(0), bit_vote(pow2))
        out = out + F.when(bit_sum > 0, F.lit(pow2).cast("bigint")).otherwise(F.lit(0))
    return out
