"""Deduplication operators for LLM training-data pipelines: exact,
word-shingle Jaccard (exact), MinHash+LSH (approximate, scale path), and
SimHash.

Scale design (100 TB):
- Exact dedup is a hash groupBy on the normalized key — one shuffle of
  (key_hash, id); at scale group by md5 fingerprint, never the raw text.
- Exact all-pairs Jaccard is O(n²) and only exists as the small-scale oracle
  / verification path. The scale path is MinHash+LSH: per-doc signature
  (narrow, one pass), band buckets, and a shuffle that only carries
  (band_hash -> doc_id) pairs; candidate pairs are then verified with exact
  Jaccard on the (tiny) candidate set. This is the standard
  shingle->minhash->band->bucket-join construction.
- SimHash gives a 64-bit near-dup signature; Hamming-adjacent buckets are
  found by splitting the 64 bits into 4 16-bit keys (any pair within
  Hamming distance 3 shares at least one key — pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import TOKEN_SPLIT_RE


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the min-id representative per duplicate group (deterministic,
    unlike dropDuplicates' arbitrary pick)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )


def shingle_array(df: DataFrame, text: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Word n-gram shingles as an array column (``sh_arr``) — a narrow
    projection, no explode/shuffle. Docs with fewer than ``n`` tokens get an
    empty array."""
    idx = ", ".join(f"t[i+{j}]" for j in range(n))
    return df.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text))), TOKEN_SPLIT_RE).alias("t"),
    ).select(
        id_col,
        F.when(
            F.size("t") >= n,
            F.expr(f"transform(sequence(0, size(t) - {n}), i -> concat_ws(' ', {idx}))"),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("sh_arr"),
    )


def word_shingles(df: DataFrame, text: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles, exploded to (id, shingle) rows — the
    set-table form used by the exact-Jaccard (verification/oracle) path."""
    return (
        shingle_array(df, text, id_col, n)
        .select(id_col, F.explode("sh_arr").alias("shingle"))
        .distinct()
    )


def jaccard_pairs(shingles: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact pairwise Jaccard over a (id, shingle) set table. O(pairs sharing
    a shingle) — the verification/oracle path, not the 100 TB path."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
    )


def minhash_signatures(
    with_shingle_arr: DataFrame, id_col: str = "doc_id", num_perm: int = 32
) -> DataFrame:
    """Per-doc MinHash signature: permutation i is min(xxhash64(shingle, i)),
    folded over the per-row shingle ARRAY — a pure narrow projection with
    ZERO shuffle (duplicates in the array can't change a min). At 100 TB
    this is the difference between shuffling O(docs*shingles) rows and
    shuffling nothing. Seeded xxhash64 keeps everything JVM-side."""
    max_long = F.lit(0x7FFFFFFFFFFFFFFF).cast("long")

    def min_hash(i: int):
        return lambda acc, s: F.least(acc, F.xxhash64(s, F.lit(i)))

    sig_cols = [
        F.aggregate(F.col("sh_arr"), max_long, min_hash(i)).alias(f"mh{i}")
        for i in range(num_perm)
    ]
    return with_shingle_arr.select(id_col, *sig_cols)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Band the signature (rows = num_perm/bands) and bucket-join: docs
    sharing any band hash become candidate pairs. The only shuffle carries
    (band_id, band_hash) keys — O(docs*bands) rows regardless of corpus
    size."""
    rows = num_perm // bands
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = signatures.select(id_col, *band_cols)
    stacked = banded.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("band_hash"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band_id", "bb.band_hash")
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> LSH candidates ->
    exact-Jaccard verification of the candidate pairs ONLY (the all-pairs
    jaccard_pairs path is the small-scale oracle; here the expensive exact
    check touches just the LSH survivors). Output: (doc_a, doc_b, jaccard)
    pairs above threshold."""
    sh = word_shingles(df, text, id_col, n).cache()
    sigs = minhash_signatures(shingle_array(df, text, id_col, n), id_col, num_perm)
    cand = lsh_candidate_pairs(sigs, id_col, num_perm, bands)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("shingle"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("shingle"))
    common = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over tokens: per bit j, sign of sum over tokens of
    (bit_j(xxhash64(token)) ? +1 : -1). Computed as array folds over the
    per-row token-hash array — a narrow projection, no explode, no shuffle
    (the earlier explode+groupBy formulation shuffled O(tokens) rows)."""
    hashes = F.transform(
        F.split(F.lower(F.trim(F.col(text))), TOKEN_SPLIT_RE), lambda t: F.xxhash64(t)
    )
    with_h = df.select(F.col(id_col), hashes.alias("hs"))
    def bit_sum(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_sums = [
        F.aggregate(F.col("hs"), F.lit(0), bit_sum(j)).alias(f"s{j}")
        for j in range(64)
    ]
    sums = with_h.select(id_col, *bit_sums)
    sig = None
    for j in range(64):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sums.select(id_col, sig.alias("simhash"))


def simhash_near_dups(df: DataFrame, text: str = "text", id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on each of the 4 16-bit segments
    (pigeonhole: Hamming<=3 pairs share a segment), verify Hamming distance
    via bit_count(xor)."""
    sig = simhash(df, text, id_col)
    seg = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("seg_id"),
                        F.shiftright(F.col("simhash"), 16 * k)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("seg"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("s"),
    ).select(id_col, "simhash", "s.seg_id", "s.seg")
    a, b = seg.alias("a"), seg.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.seg_id") == F.col("b.seg_id"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
