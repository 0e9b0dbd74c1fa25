"""Embedding similarity search (LLM extension): brute-force cosine top-k as
the exact baseline, random-hyperplane LSH bucketing as the approximate scale
path, and vector aggregation (per-label centroids).

Scale design (100 TB):
- Brute-force top-k against ONE query vector is a narrow map + TakeOrdered —
  embarrassingly parallel, no shuffle; fine at any scale and the exactness
  baseline for recall measurement.
- All-pairs similarity is O(n²) — never run raw at scale. The LSH path
  buckets vectors by sign patterns of deterministic pseudo-random
  hyperplanes (hash-seeded, reproducible across runs/executors with no
  driver-side randomness), so the self-join only pairs within buckets.
- Dot products use `aggregate(zip_with(...))` — JVM columnar loop per row,
  no Python. For very wide vectors a vectorized pandas_udf over Arrow would
  amortize better; at dim=64 the built-in expression wins (no serialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _require_integral_ids(df: DataFrame, cols: list[str], where: str) -> None:
    """The Arrow grouped-map stages in this module emit ids through
    hardcoded ``long`` schemas; a non-integral id column would corrupt or
    crash deep inside a pandas worker, far from the call site. Fail HERE,
    loudly, instead."""
    for c in cols:
        dt = df.schema[c].dataType.typeName()
        if dt not in ("byte", "short", "integer", "long"):
            raise TypeError(
                f"{where}: column {c!r} must be an integral id type for the "
                f"Arrow stages (got {dt}); map your ids to longs first "
                f"(e.g. xxhash64 or a dense rank)"
            )


def dot(a: str | Column, b: str | Column) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.
    Plans as scan -> project -> TakeOrderedAndProject (per-partition heap)."""
    q = lit_double_array([float(x) for x in query_vec])
    sim = F.round(cosine(F.col(vec_col), q), 5).alias("sim")
    return (
        embeddings.select(id_col, sim)
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Exact top-k for a BATCH of query vectors in one job — the evaluation
    / serving shape (recall@k sweeps, dedup-against-probe-set). The query
    set broadcasts; the corpus is scanned ONCE with norms hoisted, each
    (corpus row × query) pair folds the vectors once, and per-query top-k
    comes from a rank window partitioned by query id.

    Scale: corpus-side work is O(corpus × n_queries × dim) with no corpus
    shuffle (broadcast join); the only shuffle carries (query_id, id, sim)
    rows for the rank — at large n_queries that's the partitioning you
    want anyway (one reducer per query). For n_queries beyond broadcast
    size, switch to the LSH/IVF paths which prune the corpus per query."""
    from pyspark.sql.window import Window

    # r19: the (corpus x query) fold does O(n_queries x dim) float work per
    # corpus row; on the driver's single-split scan that ran in ONE task.
    # Size-gated spread — a no-op once the corpus scan has real splits.
    from .parallelism import spread_fanout

    corpus = spread_fanout(
        embeddings.select(
            F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("nrm")
        )
    )
    qs = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        norm(F.col(query_vec_col)).alias("qnrm"),
    )
    sim = F.round(
        dot(F.col(vec_col), F.col(query_vec_col)) / (F.col("nrm") * F.col("qnrm")), 5
    ).alias("sim")
    scored = corpus.join(F.broadcast(qs)).select(query_id_col, id_col, sim)
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .orderBy(query_id_col, "rk")
    )


def pairwise_cosine(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact all-pairs cosine (small-scale / verification path only).
    Norms are computed once per side before the pair join, so each of the
    O(n²) pairs folds the vectors once (dot) instead of three times."""
    with_norm = embeddings.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("nrm")
    )
    a = with_norm.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na")
    )
    b = with_norm.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 5).alias("sim"),
    )


EMBED_DIM = 64  # driver embeddings table dimension


def plane_matrix(n_planes: int, dim: int = EMBED_DIM, seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane components in [-1, 1), from a
    seeded PRNG on the driver — the matrix is a pure function of
    (seed, n_planes, dim), embedded in the plan as literals, so it is
    reproducible across runs and executors. (A first version derived each
    component from xxhash64(p, d) per ROW inside a fold — recomputing
    n_planes×dim hashes for every vector; the literal matrix removes all
    of that from the hot path at a cost of n_planes×dim constants in the
    plan.)"""
    import random

    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lit_double_array(values: list[float]) -> Column:
    """Literal array<double> built from ONE parsed SQL expression. Building
    it as F.array(*[F.lit(v) ...]) costs one py4j round-trip per element —
    ~2 s of driver time for a 6×64 plane matrix — while a single expr
    string parses in microseconds. repr() round-trips doubles exactly, so
    the values are bit-identical."""
    return F.expr("array(" + ",".join(f"{v!r}D" for v in values) + ")")


def _plane_bit_sql(vec_col: str, weights: list[float]) -> str:
    """SQL for the sign bit of the projection onto one literal plane. The
    whole bucket expression is assembled as ONE string and parsed in a
    single py4j call — building it from Column-API higher-order functions
    costs a py4j round-trip per lambda and dominated plan-construction
    time (~1 s per query) before this."""
    arr = "array(" + ",".join(f"{w!r}D" for w in weights) + ")"
    return (
        f"CASE WHEN aggregate(zip_with({vec_col}, {arr}, (x, w) -> CAST(x AS DOUBLE) * w), "
        f"0D, (a, v) -> a + v) > 0 THEN 1L ELSE 0L END"
    )


def lsh_hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit pattern of ``n_planes``
    literal hyperplanes (seeded, so multi-table OR-constructions get
    independent planes per table)."""
    planes = plane_matrix(n_planes, dim, seed)
    bucket = " | ".join(
        f"shiftleft({_plane_bit_sql(vec_col, planes[p])}, {p})" for p in range(n_planes)
    )
    return embeddings.select(id_col, vec_col, F.expr(bucket).alias("bucket"))


def hyperplane_lsh_tables(
    embeddings: DataFrame,
    n_tables: int = 12,
    planes_per_table: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Multi-table (OR-construction) hyperplane LSH bucket assignment via a
    single Arrow-batched ``mapInPandas`` pass: ``n_tables`` independent
    bucket codes of ``planes_per_table`` planes each, stacked to
    (id, vec, table_id, bucket) rows. A pair at cosine s has per-table
    collision prob (1 - acos(s)/pi)^p and overall candidate prob
    1 - (1 - (1-acos(s)/pi)^p)^L — tune (p, L) to the target similarity.

    Why pandas and not column expressions: the projection is a dense
    (n, dim) @ (dim, L*p) product — numpy does the whole Arrow batch as one
    GEMM, where per-element fold expressions evaluate interpreted. This is
    exactly the "vectorized Pandas UDF for wide vectors" tradeoff. The
    output carries each vector L times (O(rows × L × dim) shuffle) so
    downstream per-bucket work needs no join back to fetch vectors."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    _require_integral_ids(embeddings, [id_col], "hyperplane_lsh_tables")
    planes = [
        plane_matrix(planes_per_table, dim, seed=1000 + t) for t in range(n_tables)
    ]
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(vec_col, ArrayType(DoubleType())),
            StructField("table_id", IntegerType()),
            StructField("bucket", LongType()),
        ]
    )

    def assign(batches):
        import numpy as np
        import pandas as pd

        P = np.array(planes)  # (L, p, dim)
        L, p, _ = P.shape
        flat = P.reshape(L * p, -1)
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # (n, dim)
            proj = V @ flat.T  # (n, L*p)
            bits = (proj > 0).astype(np.int64).reshape(len(V), L, p)
            buckets = np.zeros((len(V), L), dtype=np.int64)
            for j in range(p):
                buckets |= bits[:, :, j] << j
            frames = [
                pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        vec_col: pdf[vec_col],
                        "table_id": t,
                        "bucket": buckets[:, t],
                    }
                )
                for t in range(L)
            ]
            yield pd.concat(frames, ignore_index=True)

    # r19: the single-split embeddings scan ran the L-way GEMM+stack fan-out
    # (O(rows x L x dim) output) in ONE task (profiled 3.5 s, 12.7 MB write
    # from 1 task at sf0.1); spread parallelizes it, size-gated to a no-op
    # at corpus scale.
    from .parallelism import spread_fanout

    return spread_fanout(embeddings.select(id_col, vec_col)).mapInPandas(
        assign, out_schema
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.5,
    n_tables: int = 12,
    planes_per_table: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via multi-table LSH: candidates =
    pairs sharing a bucket in ANY table, found by a per-bucket numpy GEMM
    (``applyInPandas`` per (table_id, bucket): normalize the bucket's
    (n, dim) block once, one n×n matmul, threshold with a float-order
    epsilon). Final sims are then re-computed EXACTLY with the JVM fold on
    the (tiny) surviving candidate set, so output values are bit-stable
    against the SQL oracle regardless of numpy summation order. Precision
    is exact (verify stage); recall is the OR-construction S-curve at the
    operating point — deterministic on fixed data and gated against the
    exact all-pairs oracle (CORRECTNESS) and a planted-near-dup fixture
    (tests/test_recall.py).

    Operating point note: (p=2, L=12) targets the test corpus' 0.45-cosine
    regime (per-pair miss prob < 2e-3). A production 0.9+ near-dup dedup
    would run (p=8..10, L=8..12): far fewer candidates per table, same
    construction. Skew note: per-bucket work is O(bucket²·dim); a giant
    bucket means the planes under-partition that region — raise
    planes_per_table rather than salting (salting splits true pairs across
    buckets and silently cuts recall)."""
    from pyspark.sql.types import LongType, StructField, StructType

    _require_integral_ids(embeddings, [id_col], "embedding_near_dup_pairs")
    stacked = hyperplane_lsh_tables(
        embeddings, n_tables, planes_per_table, id_col, vec_col, dim
    )
    pair_schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )
    # Prefilter epsilon must cover BOTH numpy-vs-JVM summation-order drift
    # AND the verify stage's round-to-5-decimals half-width (5e-6): the
    # exact stage accepts round(sim, 5) >= threshold, so a true cosine of
    # threshold - 4.9e-6 is a positive — the prefilter may only discard
    # pairs strictly below threshold - 5e-6 - drift. 1e-5 bounds that;
    # a too-small eps here is a deterministic recall hole at the boundary.
    eps = 1e-5

    def bucket_pairs(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        N = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = N @ N.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = S[iu, ju] >= threshold - eps
        return pd.DataFrame({"id_a": ids[iu[keep]], "id_b": ids[ju[keep]]})

    # r19: explicit partition count for the per-bucket GEMM stage — AQE
    # coalesces the groupBy exchange by BYTE size (measured: 9 tasks at
    # sf0.1), but the stage's cost is the Python-side O(bucket² x dim)
    # matmul, invisible to byte-based sizing. A user-specified count is
    # never coalesced; defaultParallelism keeps it scale-adaptive.
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    cand = (
        stacked.repartition(par, "table_id", "bucket")
        .groupBy("table_id", "bucket")
        .applyInPandas(bucket_pairs, pair_schema)
        .distinct()
    )
    with_norm = embeddings.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("nrm")
    )
    va = with_norm.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na")
    )
    vb = with_norm.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 5).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_radius: int = 0,
) -> DataFrame:
    """Approximate top-k with MULTIPROBE: probe every bucket within Hamming
    distance ``probe_radius`` of the query's LSH bucket, exact cosine within
    the probed candidate set. radius 0 is single-bucket (~n/2^planes
    candidates); each +1 of radius adds C(planes, r) buckets — the standard
    recall/cost dial.

    The query's bucket and the probe set are computed on the DRIVER in pure
    Python — the plane matrix is already a driver-side literal, and the
    Python left-to-right sum reproduces the JVM fold's float order exactly,
    so driver and executor agree bit-for-bit. The probed scan is then a
    simple ``bucket IN (...)`` filter: no second bucket plan for the query
    vector, no broadcast join, and with the table laid out partitioned by
    bucket this is pure partition pruning at 100 TB."""
    import itertools

    dim = len(query_vec)
    planes = plane_matrix(n_planes, dim)
    q_bucket = 0
    for p in range(n_planes):
        proj = 0.0
        for x, w in zip(query_vec, planes[p]):  # JVM fold order
            proj += float(x) * w
        if proj > 0:
            q_bucket |= 1 << p
    probe_set = {q_bucket}
    for r in range(1, probe_radius + 1):
        for bits in itertools.combinations(range(n_planes), r):
            probe_set.add(q_bucket ^ sum(1 << b for b in bits))

    bucketed = lsh_hyperplane_buckets(embeddings, n_planes, id_col, vec_col, dim=dim)
    q = lit_double_array([float(x) for x in query_vec])
    return (
        bucketed.filter(F.col("bucket").isin(*sorted(probe_set)))
        .select(id_col, F.round(cosine(F.col(vec_col), q), 5).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse-quantizer centroids as (label, centroid array<double>).
    Same posexplode + partial-agg shuffle as label_centroids (O(labels×dims)
    shuffled rows), then the per-dim averages are re-assembled into an
    ordered array per label. In a full IVF the labels come from k-means;
    here the corpus ships a cluster label column, which plays the role of
    the trained coarse quantizer."""
    exploded = embeddings.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("dim", "v")
    )
    per_dim = exploded.groupBy(label_col, "dim").agg(
        F.avg(F.col("v").cast("double")).alias("c")
    )
    return per_dim.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 3,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: rank the coarse-quantizer centroids by similarity to
    the query, probe only the ``n_probe`` nearest inverted lists (labels),
    exact cosine within them. The centroid table is O(labels) — a broadcast;
    the probe is a broadcast-semi-join that prunes the scan to the probed
    lists (with the table partitioned by label, that's partition pruning at
    100 TB). n_probe is the recall/cost dial, exactly like LSH probe
    radius."""
    q = lit_double_array([float(x) for x in query_vec])
    probed_labels = (
        ivf_centroids(embeddings, label_col, vec_col)
        .select(label_col, cosine(F.col("centroid"), q).alias("csim"))
        .orderBy(F.col("csim").desc(), label_col)
        .limit(n_probe)
        .select(label_col)
    )
    return (
        embeddings.join(F.broadcast(probed_labels), label_col)
        .select(id_col, F.round(cosine(F.col(vec_col), q), 5).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid via posexplode + per-dimension avg — the shuffle
    carries (label, dim, partial_sum), i.e. O(labels*dims), not O(rows).
    Output is flat (label, dim, centroid_val) for engine-agnostic compare."""
    exploded = embeddings.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("dim", "v")
    )
    return (
        exploded.groupBy(label_col, "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_val"))
    )


def mmr_rerank(
    candidates_with_vecs: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "rel",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance rerank of a per-query candidate set:
    greedily pick k items maximizing ``lam*rel - (1-lam)*max_sim_to_picked``
    (first pick = pure relevance). Input: one row per (query, candidate)
    with the candidate's relevance and embedding.

    Scale design (the serving/curation shape): MMR is inherently a small-k
    greedy over an ALREADY-PRUNED candidate set (ANN/exact top-N, N ≲ 100),
    so the right distribution is one group per query — candidate-pair
    similarities are built by a per-query self-join (N² rows per query,
    bounded by the prefilter), and the greedy itself runs vectorized in
    ``applyInPandas`` over each group. Every float the greedy consumes
    (rel, pair sims, both rounded to 5) is computed JVM-side with the same
    expressions as the exact top-k operators — the pandas stage only
    selects argmaxes over given numbers, so results are bit-reproducible
    across engines and partitionings.
    """
    import pandas as pd

    _require_integral_ids(
        candidates_with_vecs, [query_id_col, id_col], "mmr_rerank"
    )
    c = candidates_with_vecs.select(
        F.col(query_id_col).alias("qid"),
        F.col(id_col).alias("cid"),
        F.col(rel_col).alias("rel"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),
    )
    a = c.select("qid", F.col("cid").alias("ia"), F.col("rel").alias("rel_a"),
                 F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = c.select("qid", F.col("cid").alias("ib"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"))
    pairs = (
        a.join(b, "qid")
        .filter(F.col("ia") != F.col("ib"))
        .select(
            "qid", "ia", "rel_a", "ib",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 5
                    ).alias("s"),
        )
    )
    # A query with exactly ONE candidate produces zero pair rows (ia != ib
    # filters everything), which would make its group vanish from the
    # grouped-map output entirely — the correct answer is that candidate at
    # rank 1. Null-partner marker rows keep every candidate (and therefore
    # every query) present; the greedy ignores them for similarity lookups.
    markers = c.select(
        "qid",
        F.col("cid").alias("ia"),
        F.col("rel").alias("rel_a"),
        F.lit(None).cast("long").alias("ib"),
        F.lit(None).cast("double").alias("s"),
    )
    pairs = pairs.unionByName(markers)

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["qid"].iloc[0])
        rel = (
            pdf.drop_duplicates("ia").set_index("ia")["rel_a"].to_dict()
        )
        sim = {
            (int(r.ia), int(r.ib)): float(r.s)
            for r in pdf.itertuples()
            if pd.notna(r.ib)
        }
        remaining = sorted(rel)
        picked: list[tuple[int, float]] = []
        while remaining and len(picked) < k:
            best_id, best_score = None, None
            for cid in remaining:
                if not picked:
                    score = float(rel[cid])
                else:
                    ms = max(sim[(cid, p)] for p, _ in picked)
                    score = lam * float(rel[cid]) - (1.0 - lam) * ms
                # strict > : ties resolve to the LOWEST id (sorted order)
                if best_score is None or score > best_score:
                    best_id, best_score = cid, score
            picked.append((best_id, best_score))
            remaining.remove(best_id)
        return pd.DataFrame(
            {
                "query_id": qid,
                "rank": range(1, len(picked) + 1),
                "vec_id": [p for p, _ in picked],
                "mmr": [round(s, 6) for _, s in picked],
            }
        )

    return (
        pairs.groupBy("qid")
        .applyInPandas(greedy, "query_id long, rank long, vec_id long, mmr double")
        .orderBy("query_id", "rank")
    )
