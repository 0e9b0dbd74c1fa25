"""PCA embedding compression with a MERGEABLE moment state — the
linear-projection member of the embedding-maintenance family (r19
library capability, post-saturation policy: no registry entry; laws +
hypothesis sweep vs an exact numpy model + scale rung).

Where it sits: the registered embedding arc covers coarse quantization
(IVF), product quantization (PQ ADC), scalar quantization
(`embedding_quantization`) and ANN search; PCA is the standard
dimensionality-reduction step in front of them (e.g. OPQ/PCA-PQ: Ge et
al., "Optimized product quantization", CVPR 2013 precede PQ with a
rotation/projection; Jégou et al.'s IVFADC pipelines routinely PCA
64-128d before coding). This module gives that step the package's
maintenance algebra instead of a fit-once black box.

THE SPLIT (the kmeans/heavy-hitters convention): the corpus-scale work
is ONE aggregate producing the MOMENT STATE — n, per-dimension sums,
and the upper-triangle cross-product sums (d(d+1)/2 narrow rows, 2 080
at d=64) — which is a plain additive group: shards/days merge by keyed
sum, so the covariance of a growing corpus is maintained with ZERO
re-scans (the LM-counts story for second moments). `pca_fit` then runs
on the BOUNDED state (the audited `.take(n)` driver exchange — O(d²)
doubles, the kmeans centroid-matrix precedent) and solves the
eigenproblem with numpy on the driver: a d×d symmetric eigh is
microseconds of driver math; distributing it would be theater.
`pca_transform` projects in ONE scan with zero joins — the (μ, W)
model rides in as a collected scalar through the broadcast-crossJoin
convention, and the centered dot products are higher-order folds
(zip_with + aggregate), no UDFs.

DETERMINISM: eigenvectors are sign-ambiguous, so the model pins the
convention — each component is flipped so its largest-|weight| entry
(first such index on ties) is positive — making fit a pure function of
the moment state and letting the laws assert component equality
against numpy, not |cos| fuzz. Covariance uses the n-1 (sample)
denominator; numpy.cov's default, asserted exactly in the laws.

LAWS (test-pinned in tests/test_pca.py):
- moment merge lossless + commutative (n exact; sums at float
  tolerance — double addition is order-sensitive across partitions);
- incremental days ≡ rebuild at the same tolerance;
- fit == numpy (eigenvalues, components under the sign pin, explained
  ratios) on the embeddings fixture AND on hypothesis-swept random
  data;
- orthonormality: W Wᵀ == I_k within 1e-9;
- projected-coordinate variances == eigenvalues (the defining PCA
  property), k=d reconstruction error ≈ 0, error monotone in k;
- plan: moment build is pure aggregate (no join); transform is a
  single scan whose only join is the scalar model ride-in.

Reference parity note: the reference (StreamJob.java) has no vector
path at all — this belongs to the LLM-pipeline extension's embedding
arc next to IVF/PQ.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAMomentState(NamedTuple):
    counts: DataFrame  # single row (n long)
    dim_sums: DataFrame  # (i int, s double) — Σ x_i, d rows
    cross_sums: DataFrame  # (i int, j int, s double) — Σ x_i·x_j, i <= j


class PCAModel(NamedTuple):
    mean: list[float]  # μ, length d
    components: list[list[float]]  # W, k rows of length d (sign-pinned)
    eigenvalues: list[float]  # top-k sample variances, descending
    explained_ratio: list[float]  # eigenvalue / total variance


def pca_moment_state(vecs: DataFrame, vec_col: str = "embedding") -> PCAMomentState:
    """The one corpus-scale pass: three map-side-combined aggregates over
    the exploded vector (dim terms + upper-triangle cross terms, cast to
    double BEFORE multiplying — float32 products lose the tail the
    eigensolve needs). d(d+1)/2 + d + 1 output rows regardless of corpus
    size."""
    v = F.col(vec_col).cast("array<double>")
    dims = vecs.select(F.posexplode(v).alias("i", "x"))
    # the empty-array guard matters: Spark's sequence(0, -1) counts DOWN
    # ([0, -1]) rather than returning an empty range, and element_at(0)
    # throws — an empty vector must contribute nothing, not crash
    cross = vecs.filter(F.size(F.col(vec_col)) > 0).select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(0, size({vec_col}) - 1), i -> "
                f"transform(sequence(i, size({vec_col}) - 1), j -> "
                f"struct(i, j, CAST(element_at({vec_col}, i + 1) AS DOUBLE) * "
                f"CAST(element_at({vec_col}, j + 1) AS DOUBLE) AS v))))"
            )
        ).alias("t")
    )
    return PCAMomentState(
        counts=vecs.filter(F.size(F.col(vec_col)) > 0).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        ),
        dim_sums=dims.groupBy("i").agg(F.sum("x").alias("s")),
        cross_sums=cross.select("t.i", "t.j", "t.v")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("s")),
    )


def pca_moment_merge(a: PCAMomentState, b: PCAMomentState) -> PCAMomentState:
    """Merge shard/day moment states: keyed sums — the additive-group
    maintenance story (covariance of the union with zero re-scans)."""
    return PCAMomentState(
        counts=a.counts.unionByName(b.counts).agg(
            F.sum("n").cast("long").alias("n")
        ),
        dim_sums=a.dim_sums.unionByName(b.dim_sums)
        .groupBy("i")
        .agg(F.sum("s").alias("s")),
        cross_sums=a.cross_sums.unionByName(b.cross_sums)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s")),
    )


def pca_moment_remove(
    state: PCAMomentState, removed: DataFrame, vec_col: str = "embedding"
) -> PCAMomentState:
    """Takedown support for second moments (the CBF delete story): the
    moment state is an additive group, so removing a vector batch is
    merging its NEGATED moments — the result equals a state that never
    saw those vectors (exactly on the integers n, at float tolerance on
    the sums), with zero corpus re-scans. Contract: ``removed`` must be
    vectors the state actually summarized (membership-closed, the
    tombstone family's rule); over-removal shows up as n drifting below
    the survivor count — the caller's count audit, since float sums
    carry no per-key observability the way CBF counters do."""
    neg = pca_moment_state(removed, vec_col)
    return PCAMomentState(
        counts=state.counts.unionByName(
            neg.counts.select((-F.col("n")).cast("long").alias("n"))
        ).agg(F.sum("n").cast("long").alias("n")),
        dim_sums=state.dim_sums.unionByName(
            neg.dim_sums.select("i", (-F.col("s")).alias("s"))
        )
        .groupBy("i")
        .agg(F.sum("s").alias("s")),
        cross_sums=state.cross_sums.unionByName(
            neg.cross_sums.select("i", "j", (-F.col("s")).alias("s"))
        )
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s")),
    )


def pca_fit(state: PCAMomentState, k: int) -> PCAModel:
    """Solve the d×d sample-covariance eigenproblem on the driver from
    the BOUNDED moment state (the audited .take(n) exchange — O(d²)
    rows by construction, the kmeans centroid-matrix precedent).
    Requires n >= 2. Components are sign-pinned (largest-|weight| entry
    positive, first index on ties)."""
    import numpy as np

    n = state.counts.take(1)[0]["n"]
    if n < 2:
        raise ValueError(f"pca_fit needs n >= 2 vectors, got {n}")
    dim_rows = state.dim_sums.take(1 << 20)
    d = len(dim_rows)
    sums = np.zeros(d)
    for r in dim_rows:
        sums[r["i"]] = r["s"]
    cross = np.zeros((d, d))
    for r in state.cross_sums.take(1 << 22):
        cross[r["i"], r["j"]] = r["s"]
        cross[r["j"], r["i"]] = r["s"]
    mu = sums / n
    cov = (cross - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    top = []
    for idx in order:
        w = evecs[:, idx]
        pivot = int(np.argmax(np.abs(w)))
        if w[pivot] < 0:
            w = -w
        comps.append([float(x) for x in w])
        top.append(float(evals[idx]))
    total = float(np.trace(cov))
    return PCAModel(
        mean=[float(x) for x in mu],
        components=comps,
        eigenvalues=top,
        explained_ratio=[(ev / total if total > 0 else 0.0) for ev in top],
    )


def pca_model_df(model: PCAModel, spark) -> DataFrame:
    """(comp, dims array<double>, eigenvalue, explained_ratio, mean) —
    the persistable model table (mean repeated per row for a flat
    schema; k rows total)."""
    return spark.createDataFrame(
        [
            (i, model.components[i], model.eigenvalues[i],
             model.explained_ratio[i], model.mean)
            for i in range(len(model.components))
        ],
        "comp long, dims array<double>, eigenvalue double, "
        "explained_ratio double, mean array<double>",
    )


def pca_transform(
    vecs: DataFrame,
    model_df: DataFrame,
    vec_col: str = "embedding",
    out: str = "proj",
) -> DataFrame:
    """Append the k-dim projection (x − μ)·Wᵀ: ONE scan, zero joins —
    the sorted (comp, dims, mean) model rides in as a collected-array
    scalar via the broadcast-crossJoin convention; the centered dots
    are zip_with + aggregate folds in the JVM."""
    m = F.broadcast(
        model_df.agg(
            F.array_sort(
                F.collect_list(F.struct("comp", "dims", "mean"))
            ).alias("_pca")
        )
    )
    v = F.col(vec_col).cast("array<double>")
    return (
        vecs.crossJoin(m)
        .withColumn(
            out,
            F.transform(
                F.col("_pca"),
                lambda c: F.aggregate(
                    F.zip_with(
                        F.zip_with(v, c.getField("mean"), lambda x, mu: x - mu),
                        c.getField("dims"),
                        lambda cx, w: cx * w,
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                ),
            ),
        )
        .drop("_pca")
    )
