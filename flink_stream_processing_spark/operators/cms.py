"""Turnstile Count-Min sketch store — the DELETE-capable point-frequency
summary (r19 library capability, post-saturation policy: no registry
entry; laws + hypothesis sweep vs an exact Python model + in-suite
DuckDB oracle for the md5 twin + scale rung).

Completes the takedown story across every persisted summary family in
the engine: the exact fingerprint store anti-joins, the admission screen
gained `operators/cbf.py`, span refcounts decrement, PCA moments
subtract — and point-frequency queries get this module. The registered
CMS rows (`count_min_sketch_tokens`, `cms_join_cardinality`) are
one-shot batch ESTIMATES; this is the STORE form a daily pipeline
persists between runs, in the TURNSTILE stream model (Cormode &
Muthukrishnan, "An improved data stream summary: the count-min sketch
and its applications", J. Algorithms 2005 — §4 handles negative
updates): cells are plain sums, so

    insert  = +w on the key's d cells      merge = keyed cell sum
    delete  = −w on the same cells         (lossless, exact)
    query   = min over the key's d cells   (never underestimates while
                                            updates stay membership-
                                            closed, i.e. net counts are
                                            non-negative — the same
                                            contract as every takedown
                                            path here)

State: SPARSE (j, bucket, c) rows over d rows × w buckets — ≤ min(d·n,
d·w) rows; untouched cells never materialize, absent cells read 0. The
point query broadcasts the O(d·w) state into the probe scan (the
bloom/CBF join-pruning shape — the probe side never shuffles).

Hashing: xxhash64(key, j) mod w production default, with the md5 TWIN
(`hash_fn="md5"`, conv(md5(key:j)[:8]) mod w — the registered
`cms_join_cardinality` bucket convention) whose cells DuckDB recomputes
bit-identically for the in-suite oracle.

LAWS (test-pinned in tests/test_cms.py):
- lossless merge: cms(A) + cms(B) == cms(A ⊎ B) cell-identical,
  commutative;
- exact inverse: removing a key multiset's counts leaves the state
  cell-identical to a build that never saw it;
- never-underestimate: query(key) >= true(key) for every key, before
  AND after membership-closed removal (the CMS guarantee survives
  turnstile deletes with non-negative net counts);
- weighted updates: positive weights sum exactly (the weighted-MG
  contract);
- md5-twin DuckDB oracle: cell state bit-identical cross-engine;
- plan: build is one explode + one aggregate (no join); query
  broadcasts the state (no SMJ/shuffle on the probe side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CMS_W = 1 << 12  # buckets per row
_CMS_D = 4  # hash rows


def _cms_cells(key_col, w: int, d: int, hash_fn: str):
    """(j, bucket) of one key's d cells, exploded."""
    j = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j")
    if hash_fn == "xxhash64":
        bucket = F.pmod(F.xxhash64(key_col, F.col("j")), F.lit(w)).alias("bucket")
    elif hash_fn == "md5":
        bucket = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", key_col, F.col("j").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % w
        ).alias("bucket")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return j, bucket


def cms_counts(
    items: DataFrame,
    key_col: str = "key",
    weight_col: str | None = None,
    w: int = _CMS_W,
    d: int = _CMS_D,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the sparse cell state (j, bucket, c) from an item stream —
    one narrow explode (d rows per item) into one map-side-combined sum.
    Row multiplicity counts (the turnstile group is what makes delete
    exact); ``weight_col`` switches to positive-weight sums."""
    wexpr = F.lit(1) if weight_col is None else F.col(weight_col)
    j, bucket = _cms_cells(F.col(key_col), w, d, hash_fn)
    return (
        items.select(F.col(key_col), wexpr.alias("_w"), j)
        .select("j", bucket, "_w")
        .groupBy("j", "bucket")
        .agg(F.sum("_w").cast("long").alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two states: one keyed sum — lossless, commutative, the
    whole maintenance story."""
    return (
        a.unionByName(b)
        .groupBy("j", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
        .filter(F.col("c") != 0)
    )


def cms_remove(
    state: DataFrame,
    removed: DataFrame,
    key_col: str = "key",
    weight_col: str | None = None,
    w: int = _CMS_W,
    d: int = _CMS_D,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Turnstile delete: merge the negated counts of the removed item
    multiset — the exact inverse of their insertion under the
    membership-closed contract. Negative cells (a violation) are KEPT
    visible, the CBF/span-refcount observability rule."""
    neg = cms_counts(removed, key_col, weight_col, w, d, hash_fn).select(
        "j", "bucket", (-F.col("c")).alias("c")
    )
    return cms_merge(state, neg)


def cms_query(
    probes: DataFrame,
    state: DataFrame,
    key_col: str = "key",
    w: int = _CMS_W,
    d: int = _CMS_D,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point-frequency estimate per distinct probe key: min over the
    key's d cells (absent cell = 0). The state is BROADCAST into the
    probe explode — the probe scan never shuffles. Output:
    (key, cms_estimate)."""
    j, bucket = _cms_cells(F.col(key_col), w, d, hash_fn)
    cells = probes.select(F.col(key_col), j).select(F.col(key_col), "j", bucket)
    return (
        cells.join(F.broadcast(state), ["j", "bucket"], "left")
        .select(
            key_col,
            F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c"),
        )
        .groupBy(key_col)
        .agg(F.min("c").alias("cms_estimate"))
    )


def cms_summary(state: DataFrame) -> DataFrame:
    """Single-row (n_cells, n_negative, n_total) diagnostic — fill for
    sizing plus the contract-violation observable."""
    return state.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.coalesce(
            F.sum(F.when(F.col("c") < 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_negative"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_total"),
    )


# --- in-suite DuckDB oracle (post-saturation policy item 1) -----------------

CMS_ORACLE_W = 1 << 10
CMS_ORACLE_D = 3

CMS_TOKENS_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS key
  FROM documents
), cells AS (
  SELECT j,
         CAST(('0x' || substring(md5(key || ':' || CAST(j AS VARCHAR)), 1, 8))
              AS BIGINT) % {CMS_ORACLE_W} AS bucket
  FROM tok, unnest(range(0, {CMS_ORACLE_D})) AS r(j)
)
SELECT j, bucket, CAST(count(*) AS BIGINT) AS c
FROM cells GROUP BY j, bucket
ORDER BY j, bucket
"""
