"""Round-4 similarity additions: product quantization (PQ) ADC search.

Completes the ANN family (brute-force exact / hyperplane LSH / IVF) with
the compressed-domain member: PQ codes + asymmetric distance. Codebooks
are deterministic (corpus vectors 0..15 sliced per subspace), so the
DuckDB oracle reproduces the code assignment AND the ADC distances — the
driver hash certifies the whole encode->table->search pipeline, not just
row counts. Distance math is arranged identically on both engines
(v·v - 2 v·c + c·c with left-fold dot products).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pq import pq_adc_topk
from ..queries import query
from ..sources.batch import load_table

_M = 4  # subspaces (width 16 on the 64-dim corpus)
_K = 16  # centroids per subspace

_PQ_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT unnest(generate_series(0, {_M - 1})) AS sub),
vexp AS (
  SELECT vec_id, sub, v[sub*16+1:(sub+1)*16] AS sv FROM e, s
), cb AS (
  SELECT CAST(vec_id AS INTEGER) AS code, sub, v[sub*16+1:(sub+1)*16] AS cent
  FROM e, s WHERE vec_id < {_K}
), q AS (
  SELECT sub, v[sub*16+1:(sub+1)*16] AS qs FROM e, s WHERE vec_id = 0
), d AS (
  SELECT vec_id, vexp.sub AS sub, code,
         list_dot_product(sv, sv) - 2*list_dot_product(sv, cent)
           + list_dot_product(cent, cent) AS d2
  FROM vexp JOIN cb ON vexp.sub = cb.sub
), assign AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
    FROM d) WHERE rn = 1
), lut AS (
  SELECT cb.sub AS sub, code,
         list_dot_product(qs, qs) - 2*list_dot_product(qs, cent)
           + list_dot_product(cent, cent) AS qd2
  FROM cb JOIN q ON cb.sub = q.sub
), scored AS (
  SELECT vec_id, sum(qd2) AS adc,
         max(CASE WHEN a.sub = 0 THEN a.code END) AS code0,
         max(CASE WHEN a.sub = 1 THEN a.code END) AS code1,
         max(CASE WHEN a.sub = 2 THEN a.code END) AS code2,
         max(CASE WHEN a.sub = 3 THEN a.code END) AS code3
  FROM assign a JOIN lut ON a.sub = lut.sub AND a.code = lut.code
  GROUP BY vec_id
)
SELECT vec_id, code0, code1, code2, code3, round(adc, 5) AS adc_dist
FROM scored ORDER BY round(adc, 5), vec_id LIMIT 10
"""


@query("pq_adc_topk", oracle=_PQ_ORACLE)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ top-10 by asymmetric distance: {m}x16-dim subspaces, {k} codes
    each — the corpus collapses to {m} bytes/vector and query-time work is
    {m} table lookups per vector. The oracle replays encode + LUT + search
    exactly (deterministic codebooks), certifying values, not
    bounds.""".format(m=_M, k=_K)
    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, query_id=0, m=_M, k=_K, topk=10)


# --- Johnson-Lindenstrauss random projection ------------------------------

_JL_K = 8

_JL_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dims AS (SELECT unnest(generate_series(0, 63)) AS i),
ks AS (SELECT unnest(generate_series(0, {_JL_K - 1})) AS j),
r AS (
  SELECT i, j,
         CASE WHEN ('0x' || substr(md5('jl:' || CAST(i AS VARCHAR) || ':'
                    || CAST(j AS VARCHAR)), 1, 2))::INT % 2 = 0
              THEN 1.0 ELSE -1.0 END AS sgn
  FROM dims, ks
), comp AS (
  SELECT vec_id, i.i AS i, v[i.i + 1] AS x FROM e, dims i
)
SELECT vec_id, j,
       round(sum(x * sgn) / sqrt({_JL_K}.0), 6) AS y
FROM comp JOIN r ON comp.i = r.i
GROUP BY vec_id, j
ORDER BY vec_id, j
"""


@query("jl_random_projection", oracle=_JL_ORACLE)
def q_jl_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction 64 -> {k}: a ±1
    projection matrix derived IN-ENGINE from md5 (the repo's rand()-free
    convention — the same matrix regenerates on any engine/cluster, no
    state to ship), applied as posexplode + broadcast matrix join + one
    (vec, j) aggregate. The matrix is O(d*k) and broadcast; the corpus
    shuffles once on (vec_id, j) for the sum — at 100 TB the projection is
    a single map-side-combined pass producing k floats/vector, the
    pre-step that makes downstream LSH/clustering cheap. Output in long
    form (vec_id, j, y).""".format(k=_JL_K)
    emb = load_table(spark, sf_dir, "embeddings")
    d = 64
    dims = spark.range(d).select(F.col("id").cast("int").alias("i"))
    ks = spark.range(_JL_K).select(F.col("id").cast("int").alias("j"))
    sgn = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit("jl"), F.col("i").cast("string"), F.col("j").cast("string")
                    )
                ),
                1,
                2,
            ),
            16,
            10,
        ).cast("int")
        % 2
        == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    # NB: the md5 input must be 'jl:i:j' — concat_ws(":", lit("jl"), i, j)
    # produces exactly that, matching the oracle's 'jl:' || i || ':' || j.
    r = dims.crossJoin(ks).select("i", "j", sgn.alias("sgn"))
    comp = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x")
    )
    return (
        comp.join(F.broadcast(r), "i")
        .groupBy("vec_id", "j")
        .agg(
            F.round(
                # sqrt on BOTH engines (pow(k, 0.5) can differ from sqrt(k)
                # in the last ulp across libm implementations)
                F.sum(F.col("x") * F.col("sgn")) / F.sqrt(F.lit(float(_JL_K))), 6
            ).alias("y")
        )
        .orderBy("vec_id", "j")
    )
