"""Local mirror of the driver's DuckDB-oracle comparison: row count, column
names, and order-insensitive value equality (we round doubles identically on
both sides, so comparison is exact)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from flink_stream_processing_spark.schemas import DRIVER_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(None)
            elif isinstance(v, float):
                canon_row.append(round(v, 9))
            elif hasattr(v, "item"):  # numpy scalar
                canon_row.append(round(v.item(), 9) if isinstance(v.item(), float) else v.item())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                canon_row.append(tuple(round(float(x), 6) for x in v))
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def _kind(dtype) -> str:
    """Collapse a pandas dtype to a comparison kind. The driver's value-hash
    is dtype-sensitive (an int64 column and a float64 column hash differently
    even when values are equal — e.g. DuckDB HUGEINT windowed sums arriving
    as float64), so the local gate must flag kind mismatches, not paper over
    them via ``.item()`` canonicalization."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    actual = spark_df.toPandas()
    expected = run_oracle(oracle_sql, sf_dir)
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"column mismatch: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    )
    for col in actual.columns:
        ka, ke = _kind(actual[col].dtype), _kind(expected[col].dtype)
        # Nullable int columns surface as object/float on either side; only
        # flag the unambiguous int-vs-float case (the driver-hash killer).
        if {ka, ke} == {"int", "float"} and not (
            actual[col].isna().any() or expected[col].isna().any()
        ):
            raise AssertionError(
                f"dtype kind mismatch on '{col}': spark={actual[col].dtype} "
                f"oracle={expected[col].dtype} — driver hash would differ; "
                f"CAST the oracle (or Spark) side"
            )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    a, e = _canon(actual), _canon(expected)
    for i, (ra, re_) in enumerate(zip(a, e)):
        assert ra == re_, f"row {i} differs:\n  spark : {ra}\n  oracle: {re_}"


# Shared brute-force ground truth for the fuzzy edit-class tests (the
# single divergence-proof copy — test_edge_cases and test_property_fuzzy
# both verify the operator against exactly this function).
def brute_levenshtein(s: str, t: str) -> int:
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


# Vocabulary engineered to hit every edit class: 1-sub, 2-sub (incl.
# adjacent transposition), same-length delete+insert (rotation-style,
# hamming 3 but lev 2), insert, insert+sub, double insert, repeated
# characters, and an empty string.
FUZZY_CLASS_VOCAB = [
    "", "a", "ab", "ba", "abc", "acb", "abcd", "abxd", "axyd",
    "abcde", "abced", "bcdea", "aab", "aabb", "aaab", "hello",
    "hallo", "hell", "helloo", "shello", "xyzzy", "totally-far-off",
]
