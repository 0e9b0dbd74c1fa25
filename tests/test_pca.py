"""Laws for the mergeable-moment PCA (operators/pca.py, r19 library
capability — no registry entry per the post-saturation policy; these
laws + the hypothesis sweep vs numpy ARE the gate; the eigensolve is
driver math over the bounded state, so numpy IS the exact model, not an
approximation of one). The sign pin (largest-|weight| entry positive)
makes component equality assertable — no |cosine| fuzz anywhere."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.pca import (
    pca_fit,
    pca_model_df,
    pca_moment_merge,
    pca_moment_state,
    pca_transform,
)
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR


def _np_model(X, k):
    """The exact numpy twin of pca_fit (same denominator, same sign
    pin, same ordering)."""
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)
    if cov.ndim == 0:  # d == 1
        cov = cov.reshape(1, 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        w = evecs[:, idx]
        p = int(np.argmax(np.abs(w)))
        if w[p] < 0:
            w = -w
        comps.append(w)
    return mu, np.array(comps), evals[order]


def _fixture(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _X(vecs):
    return np.array(
        vecs.orderBy("vec_id").select("embedding").toPandas()["embedding"].tolist(),
        dtype=np.float64,
    )


def test_fit_equals_numpy_on_fixture(spark):
    vecs = _fixture(spark)
    model = pca_fit(pca_moment_state(vecs), 8)
    mu, comps, evals = _np_model(_X(vecs), 8)
    assert np.allclose(model.mean, mu, atol=1e-10)
    assert np.allclose(model.eigenvalues, evals, atol=1e-8)
    assert np.allclose(np.array(model.components), comps, atol=1e-7)
    total = np.trace(np.cov(_X(vecs), rowvar=False))
    assert np.allclose(model.explained_ratio, evals / total, atol=1e-9)


def test_components_orthonormal_and_projection_variance_is_eigenvalue(spark):
    """The defining PCA properties, asserted on the real transform
    output: W Wᵀ == I_k, and each projected coordinate's sample
    variance equals its eigenvalue."""
    vecs = _fixture(spark)
    model = pca_fit(pca_moment_state(vecs), 6)
    W = np.array(model.components)
    assert np.allclose(W @ W.T, np.eye(6), atol=1e-9)
    P = np.array(
        pca_transform(vecs, pca_model_df(model, spark))
        .orderBy("vec_id")
        .select("proj")
        .toPandas()["proj"]
        .tolist()
    )
    assert np.allclose(P.var(axis=0, ddof=1), model.eigenvalues, atol=1e-8)
    # and the projection is the centered numpy projection
    X = _X(vecs)
    assert np.allclose(P, (X - np.array(model.mean)) @ W.T, atol=1e-7)


def test_moment_merge_lossless_and_incremental_equals_rebuild(spark):
    """The maintenance law: shard/day moment states summed give the same
    fit as the whole-corpus state (n exact; double sums at tolerance —
    addition order is partition-dependent)."""
    vecs = _fixture(spark)
    whole = pca_fit(pca_moment_state(vecs), 5)
    days = [pca_moment_state(vecs.filter(F.col("vec_id") % 3 == r)) for r in range(3)]
    folded = days[0]
    for d in days[1:]:
        folded = pca_moment_merge(folded, d)
    inc = pca_fit(folded, 5)
    assert inc.eigenvalues == whole.eigenvalues or np.allclose(
        inc.eigenvalues, whole.eigenvalues, atol=1e-8
    )
    assert np.allclose(
        np.array(inc.components), np.array(whole.components), atol=1e-6
    )
    n = folded.counts.take(1)[0]["n"]
    assert n == vecs.count()


def test_reconstruction_error_monotone_and_zero_at_full_rank(spark):
    vecs = _fixture(spark).limit(120)
    X = _X(vecs)
    d = X.shape[1]
    state = pca_moment_state(vecs)
    errs = []
    for k in (4, 16, d):
        model = pca_fit(state, k)
        W = np.array(model.components)
        mu = np.array(model.mean)
        R = (X - mu) @ W.T @ W + mu
        errs.append(float(((X - R) ** 2).sum()))
    assert errs[0] >= errs[1] >= errs[2]
    assert errs[2] < 1e-12 * max(1.0, float((X**2).sum()))


def test_transform_plan_single_scan_scalar_ride_in(spark):
    """Plan pins: the moment build is pure aggregate (no join node at
    all); the transform's only join is the single scalar-model BNLJ —
    no SMJ, no cartesian."""
    import re

    from flink_stream_processing_spark.plans import formatted_plan

    vecs = _fixture(spark)
    state = pca_moment_state(vecs)
    for df in (state.dim_sums, state.cross_sums):
        assert "Join" not in formatted_plan(df)
    model = pca_fit(state, 4)
    plan = formatted_plan(pca_transform(vecs, pca_model_df(model, spark)))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    bnlj = set(re.findall(r"BroadcastNestedLoopJoin[^\n(]*\((\d+)\)", plan))
    assert len(bnlj) <= 1, plan


def test_degenerate_inputs(spark):
    """n < 2 refuses loudly; constant vectors give zero variance and
    zero projections (no NaNs anywhere)."""
    import pytest

    one = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        pca_fit(pca_moment_state(one), 2)
    const = spark.createDataFrame(
        [(i, [5.0, -1.0, 2.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    model = pca_fit(pca_moment_state(const), 2)
    assert np.allclose(model.eigenvalues, 0.0, atol=1e-9)
    assert model.explained_ratio == [0.0, 0.0]
    P = np.array(
        pca_transform(const, pca_model_df(model, spark))
        .select("proj")
        .toPandas()["proj"]
        .tolist()
    )
    assert np.allclose(P, 0.0, atol=1e-9) and not np.isnan(P).any()


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.lists(
            st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=3,
        max_size=24,
    ),
    k=st.integers(min_value=1, max_value=4),
)
def test_pca_equals_numpy_model(spark_global, data, k):
    """Hypothesis sweep vs the exact numpy twin on random 4-d data:
    eigenvalues always match; components match whenever the spectrum is
    well-separated (eigenvectors of near-equal eigenvalues are not a
    stable function of the data — the law conditions on a 1e-6 gap,
    same as any numerical reference would)."""
    spark = spark_global
    X = np.array(data, dtype=np.float64)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<double>",
    )
    model = pca_fit(pca_moment_state(vecs), k)
    mu, comps, evals = _np_model(X, k)
    scale = max(1.0, float(np.abs(evals).max()))
    assert np.allclose(model.eigenvalues, evals, atol=1e-7 * scale)
    assert np.allclose(model.mean, mu, atol=1e-9)
    # Eigenvector stability needs EVERY gap around the returned spectrum —
    # including the gap between the k-th kept eigenvalue and the first
    # EXCLUDED one (hypothesis counterexample r19: 3 points in 4-d, k=3 —
    # rank-2 covariance makes eigenvalues 3 and 4 both ~0, so the 3rd
    # eigenvector is an arbitrary null-space basis vector on either engine
    # while all KEPT gaps look fine).
    full_evals = np.sort(np.linalg.eigvalsh(np.cov(X, rowvar=False)))[::-1]
    gaps_ok = all(
        (full_evals[i] - full_evals[i + 1]) > 1e-6 * scale
        for i in range(min(k, len(full_evals) - 1))
    )
    if gaps_ok:
        assert np.allclose(
            np.array(model.components), comps, atol=1e-5
        )


def test_moment_state_is_streaming_transparent(spark, tmp_path):
    """Stream ≡ batch for the moment state (the per-store streaming-
    refresh family — HLL max / bloom or / CBF sum / reservoir merge —
    extended to second moments): folding pca_moment_merge over a real
    file stream's micro-batches fits to the same spectrum as the batch
    state over the full corpus."""
    from flink_stream_processing_spark.operators.pca import PCAMomentState
    from flink_stream_processing_spark.queries_impl._stream_helpers import (
        _stream_session,
    )

    vecs = _fixture(spark).select("vec_id", "embedding")
    src = str(tmp_path / "pca_stream")
    vecs.repartition(3).write.parquet(src)

    s = _stream_session(spark)
    stream = s.readStream.schema("vec_id long, embedding array<float>").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    state: dict = {"moments": None}

    def refresh(batch_df, _batch_id):
        delta = PCAMomentState(
            *[
                df.localCheckpoint(eager=True)
                for df in pca_moment_state(batch_df)
            ]
        )
        state["moments"] = (
            delta
            if state["moments"] is None
            else PCAMomentState(
                *[
                    df.localCheckpoint(eager=True)
                    for df in pca_moment_merge(state["moments"], delta)
                ]
            )
        )

    q = stream.writeStream.foreachBatch(refresh).trigger(availableNow=True).start()
    assert q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "stream collapsed into one micro-batch"

    got = pca_fit(state["moments"], 5)
    want = pca_fit(pca_moment_state(vecs), 5)
    assert np.allclose(got.eigenvalues, want.eigenvalues, atol=1e-8)
    assert np.allclose(
        np.array(got.components), np.array(want.components), atol=1e-6
    )


def test_pca_composes_with_ivf_assignment(spark):
    """The embedding-pipeline composition: PCA-projected vectors flow
    straight into the registered IVF coarse quantizer (the
    production PCA→IVF/PQ shape) — the projected space preserves the
    fixture's label structure at least as well as chance, and the
    plumbing (array<double> proj column renamed into the vec schema)
    needs no adapters."""
    from flink_stream_processing_spark.queries_impl import store_maintenance as sm

    vecs = _fixture(spark)
    model = pca_fit(pca_moment_state(vecs), 16)
    proj = (
        pca_transform(vecs, pca_model_df(model, spark))
        .select("vec_id", "label", F.col("proj").alias("embedding"))
        .localCheckpoint(eager=True)
    )
    # centroids per true label IN THE PROJECTED SPACE, then re-assign
    cents = (
        proj.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("t"))
        .select(
            "label",
            F.expr("transform(t, s -> s.c)").alias("centroid"),
        )
    )
    assigned = sm.ivf_assign(proj.select("vec_id", "embedding"), cents)
    joined = assigned.join(
        proj.select("vec_id", F.col("label").alias("true_label")), "vec_id"
    )
    n = joined.count()
    agree = joined.filter(F.col("assigned_label") == F.col("true_label")).count()
    # near-isotropic fixture: require (much) better than the 1/n_labels
    # chance rate, not a clustering miracle
    n_labels = cents.count()
    assert n == vecs.count()
    assert agree / n > 1.5 / n_labels, (agree, n, n_labels)


def test_moment_remove_is_exact_inverse(spark):
    """Takedown law (the CBF delete story for second moments): removing
    a batch's moments leaves a state whose FIT equals the fit over the
    survivors — append N days, remove day K, no corpus re-scan. n is
    integer-exact; sums at float tolerance."""
    from flink_stream_processing_spark.operators.pca import pca_moment_remove

    vecs = _fixture(spark)
    gone = vecs.filter(F.col("vec_id") % 5 == 0)
    kept = vecs.filter(F.col("vec_id") % 5 != 0)
    after = pca_moment_remove(pca_moment_state(vecs), gone)
    assert after.counts.take(1)[0]["n"] == kept.count()
    got = pca_fit(after, 5)
    want = pca_fit(pca_moment_state(kept), 5)
    assert np.allclose(got.eigenvalues, want.eigenvalues, atol=1e-8)
    assert np.allclose(
        np.array(got.components), np.array(want.components), atol=1e-6
    )
    assert np.allclose(got.mean, want.mean, atol=1e-10)


def test_empty_vectors_are_skipped_not_counted(spark):
    """Spark's sequence(0, -1) counts DOWN and element_at(0) throws —
    an empty embedding row must contribute nothing to ANY moment (n
    included), not crash or skew the mean."""
    from flink_stream_processing_spark.operators.pca import PCAMomentState

    good = [(i, [float(i), 1.0]) for i in range(4)]
    vecs = spark.createDataFrame(
        good + [(99, [])], "vec_id long, embedding array<double>"
    )
    state = pca_moment_state(vecs)
    clean = pca_moment_state(
        spark.createDataFrame(good, "vec_id long, embedding array<double>")
    )
    assert state.counts.take(1)[0]["n"] == 4
    got, want = pca_fit(state, 2), pca_fit(clean, 2)
    assert got.mean == want.mean and got.eigenvalues == want.eigenvalues
