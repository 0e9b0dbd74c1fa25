"""Scale-factor stress for the approximate family (VERDICT r2 item 7): the
recall gates from test_recall.py re-run at sf0.1 — 10x the corpus the
driver's correctness gate uses — plus wall-time prints. This is the first
scale where a pathological bucket (hot LSH band, low-entropy SimHash
segment) would actually show; set equality against the exact brute-force
pair set proves the operating points hold, and the bucket-size guard
(operators/dedup.py) would fail loudly rather than OOM if a bucket
exploded."""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

SF_BIG = "/root/testdata/sf0.1"


def _timed(label: str, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"\n  [sf0.1] {label}: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    return out


def test_minhash_lsh_recall_at_sf01(spark):
    from flink_stream_processing_spark.operators.dedup import (
        jaccard_pairs,
        minhash_near_dups,
        word_shingles,
    )

    d = spark.read.parquet(f"{SF_BIG}/documents.parquet")
    exact = _timed(
        "exact all-pairs jaccard",
        lambda: {
            (r.doc_a, r.doc_b)
            for r in jaccard_pairs(word_shingles(d))
            .filter(F.col("jaccard") >= 0.5)
            .collect()
        },
    )
    lsh = _timed(
        "minhash_near_dups",
        lambda: {
            (r.doc_a, r.doc_b) for r in minhash_near_dups(d, threshold=0.5).collect()
        },
    )
    assert exact, "sf0.1 corpus has no near-dup pairs; gate is vacuous"
    missed = exact - lsh
    assert not missed, f"LSH missed {len(missed)}/{len(exact)} pairs at sf0.1"
    assert lsh == exact


def test_simhash_recall_at_sf01(spark):
    from flink_stream_processing_spark.operators.dedup import simhash, simhash_near_dups

    d = spark.read.parquet(f"{SF_BIG}/documents.parquet")
    sig = simhash(d)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    brute = _timed(
        "brute-force hamming",
        lambda: {
            (r.doc_a, r.doc_b)
            for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select(
                "doc_a",
                "doc_b",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("h"),
            )
            .filter(F.col("h") <= 3)
            .collect()
        },
    )
    bucketed = _timed(
        "simhash_near_dups",
        lambda: {
            (r.doc_a, r.doc_b)
            for r in simhash_near_dups(d, max_hamming=3).collect()
        },
    )
    assert brute, "sf0.1 corpus has no Hamming<=3 pairs; gate is vacuous"
    assert bucketed == brute


def test_embedding_near_dup_recall_at_sf01(spark):
    from flink_stream_processing_spark.operators.similarity import (
        embedding_near_dup_pairs,
        pairwise_cosine,
    )

    emb = spark.read.parquet(f"{SF_BIG}/embeddings.parquet")
    exact = _timed(
        "exact pairwise cosine",
        lambda: {
            (r.id_a, r.id_b)
            for r in pairwise_cosine(emb).filter(F.col("sim") >= 0.45).collect()
        },
    )
    lsh = _timed(
        "embedding_near_dup_pairs",
        lambda: {
            (r.id_a, r.id_b)
            for r in embedding_near_dup_pairs(emb, threshold=0.45, n_tables=16).collect()
        },
    )
    assert exact, "sf0.1 corpus has no pairs at the threshold; gate is vacuous"
    assert lsh == exact


def test_minhash_scaling_slope_ungated(spark):
    """Default-gate slope assertion (VERDICT r3 item 7): doubling the corpus
    (5k -> 10k sf0.1 docs, disjoint-replica bulk) must scale the LSH
    banding near-linearly. A super-linear regression (e.g. an accidental
    all-pairs expansion: 12.5M -> 50M pairs, ratio >= 4) fails HERE, in
    every pytest run, not just the opt-in stress path. Min-of-two timings
    per size absorb scheduler noise; the bound (3.0) sits between linear
    (~2, less with fixed overhead) and quadratic (~4+)."""
    from flink_stream_processing_spark.operators.dedup import minhash_near_dups

    from .test_scale_stress import synth_docs_50k

    def run(replicas: int) -> float:
        best = float("inf")
        for _ in range(2):
            corpus = synth_docs_50k(spark, replicas=replicas)
            corpus.cache()
            corpus.count()
            t0 = time.perf_counter()
            minhash_near_dups(corpus, threshold=0.5).count()
            best = min(best, time.perf_counter() - t0)
            corpus.unpersist()
        return best

    run(1)  # warm codegen/scan paths so t1 isn't cold-start-inflated
    t1 = run(1)
    t2 = run(2)
    if t2 / t1 >= 3.0:
        # One re-measure before declaring super-linear: a single slow
        # observation under full-suite load (GC pause, page-cache
        # eviction) flaked this once in ~10 suite runs; a genuine
        # quadratic blow-up (accidental all-pairs: ratio >= 4) survives
        # the retake, noise does not.
        t1 = min(t1, run(1))
        t2 = min(t2, run(2))
    ratio = t2 / t1
    print(f"\n  slope 5k->10k: {t1:.2f}s -> {t2:.2f}s (ratio {ratio:.2f})", file=sys.stderr)
    assert ratio < 3.0, (
        f"minhash banding scaled super-linearly: {t1:.2f}s -> {t2:.2f}s "
        f"(ratio {ratio:.2f}); expected ~linear in corpus size"
    )


def test_triangle_count_scaling_slope_ungated(spark):
    """Degree-oriented triangle counting must scale near-linearly when the
    graph doubles as DISJOINT replicas (ideal = exactly 2x work). A
    super-linear ratio means the orientation stopped bounding wedge
    fan-out (e.g. an accidental unoriented wedge join: out-deg d doubles
    wedge rows 4x). Synthetic graph: ~60k hash-derived edges over 10k
    nodes per replica (avg degree ~12), id-offset per replica."""
    from pyspark.sql import functions as F

    from flink_stream_processing_spark.operators.graph import triangle_counts

    def synth_edges(replicas: int):
        parts = []
        for r in range(replicas):
            off = r * 20_000
            base = spark.range(0, 60_000)
            parts.append(
                base.select(
                    (F.pmod(F.xxhash64("id"), F.lit(10_000)) + off).alias("src"),
                    (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) + off).alias("dst"),
                )
            )
        e = parts[0]
        for p in parts[1:]:
            e = e.unionByName(p)
        return e

    def run(replicas: int) -> float:
        best = float("inf")
        for _ in range(2):
            edges = synth_edges(replicas).cache()
            edges.count()
            t0 = time.perf_counter()
            triangle_counts(edges).count()
            best = min(best, time.perf_counter() - t0)
            edges.unpersist()
        return best

    run(1)  # warm codegen
    t1 = run(1)
    t2 = run(2)
    if t2 / t1 >= 3.0:
        # same noise-retake as the minhash slope test above: re-measure
        # once before declaring super-linear
        t1 = min(t1, run(1))
        t2 = min(t2, run(2))
    ratio = t2 / t1
    print(f"\n  triangle slope 60k->120k edges: {t1:.2f}s -> {t2:.2f}s (ratio {ratio:.2f})", file=sys.stderr)
    assert ratio < 3.0, (
        f"triangle counting scaled super-linearly: {t1:.2f}s -> {t2:.2f}s "
        f"(ratio {ratio:.2f}); expected ~linear for disjoint replicas"
    )
