"""Laws for PMI collocation mining (operators/pmi.py, r19 library
capability — no registry entry per the post-saturation policy; these
laws + the hypothesis sweep + the in-suite DuckDB oracle gate ARE the
gate). Counts are exact integers; scores use the overflow-safe log-sum
form shared verbatim with the oracle — empirically bit-identical at
round 6 on the fixture (900/900 pairs)."""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb
import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.pmi import (
    PMI_ORACLE,
    pmi_counts,
    pmi_merge,
    pmi_score,
)
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR


def _docs(spark, texts):
    if not texts:
        return spark.createDataFrame([], "doc_id long, text string")
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


def _py_model(texts, min_count):
    """Exact Python twin (same tokenization, same log-sum form)."""
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for t in texts:
        toks = re.split(r"\s+", t.strip().lower())
        uni.update(toks)
        pairs.update(zip(toks, toks[1:]))
    n_uni, n_bi = sum(uni.values()), sum(pairs.values())
    out = {}
    for (a, b), c in pairs.items():
        if c < min_count:
            continue
        pmi = (
            math.log(c)
            + 2 * math.log(n_uni)
            - math.log(n_bi)
            - math.log(uni[a])
            - math.log(uni[b])
        )
        denom = -math.log(c / n_bi)
        # p(a,b)==1: one pair type holds the whole mass — no collocation
        # signal, NULL on both engines (the ANSI-div guard)
        npmi = pmi / denom if c < n_bi else None
        out[(a, b)] = (c, pmi, npmi)
    return out


def test_scores_match_duckdb_oracle(spark):
    """The driver-equivalent gate: the full chain over the documents
    fixture — pairs exact, scores bit-identical at round 6."""
    docs = load_table(spark, SF_DIR, "documents")
    got = pmi_score(pmi_counts(docs)).toPandas().sort_values(["a", "b"])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(PMI_ORACLE).df().sort_values(["a", "b"])
    assert len(got) == len(want) > 0
    assert (got["a"].values == want["a"].values).all()
    assert (got["b"].values == want["b"].values).all()
    assert (got["pair_cnt"].values == want["pair_cnt"].values).all()
    assert np.allclose(got["pmi"], want["pmi"], atol=2e-6)
    assert np.allclose(got["npmi"], want["npmi"], atol=2e-6)


def test_merge_is_lossless_and_commutative(spark):
    docs = load_table(spark, SF_DIR, "documents")
    whole = pmi_counts(docs)
    a = pmi_counts(docs.filter(F.col("doc_id") % 2 == 0))
    b = pmi_counts(docs.filter(F.col("doc_id") % 2 == 1))

    def rows(df):
        return sorted(map(tuple, df.collect()))

    for m in (pmi_merge(a, b), pmi_merge(b, a)):
        assert rows(m.unigrams) == rows(whole.unigrams)
        assert rows(m.pairs) == rows(whole.pairs)
        assert rows(m.totals) == rows(whole.totals)


def test_independence_scores_zero_and_fusion_scores_one(spark):
    """Calibration anchors: in a corpus that is ONE long alternation
    'a b a b …', every pair is fully determined, so npmi("a","b") is
    maximal for its frequency; and a pair occurring exactly at chance
    rate scores pmi ≈ 0. Built exactly, not sampled."""
    # chance corpus: 'x' and 'y' each 50% of tokens, adjacent at chance
    # — the 4 pair types each 25% of transitions in a de Bruijn-ish loop
    chance = " ".join(["x x y y"] * 50)  # xx xy yy + wrap-free yx via repeat
    c = pmi_counts(_docs(spark, [chance]))
    scores = {
        (r["a"], r["b"]): r["pmi"] for r in pmi_score(c, min_count=2).collect()
    }
    # p(x)=p(y)=1/2; each of the 4 transitions ~1/4 of pairs -> pmi ~ 0
    for k, v in scores.items():
        assert abs(v) < 0.1, (k, v)

    fused = " ".join(["alpha beta"] * 30)  # beta ALWAYS follows alpha
    sc = {
        (r["a"], r["b"]): r["npmi"]
        for r in pmi_score(pmi_counts(_docs(spark, [fused])), min_count=2).collect()
    }
    top = max(sc, key=sc.get)
    assert top == ("alpha", "beta")
    assert sc[top] > 0.3  # strictly positive association, ranked first


def test_min_count_floor_is_absolute(spark):
    docs = load_table(spark, SF_DIR, "documents")
    c = pmi_counts(docs)
    assert pmi_score(c, min_count=7).filter(F.col("pair_cnt") < 7).count() == 0
    # and raising the floor only ever shrinks the table
    n5 = pmi_score(c, min_count=5).count()
    n9 = pmi_score(c, min_count=9).count()
    assert n9 <= n5


def test_plan_shape(spark):
    """Pair extraction is in-array (counts plans join nothing); scoring
    is vocabulary-sized joins + the totals scalar ride-in (≤2 BNLJ
    nodes: the totals row is itself built with one scalar crossJoin),
    no cartesian, no corpus rescan in the score plan (zero parquet
    scans — the score runs entirely on the count frames)."""
    import re as _re

    from flink_stream_processing_spark.plans import formatted_plan

    docs = load_table(spark, SF_DIR, "documents")
    c = pmi_counts(docs)
    assert "Join" not in formatted_plan(c.unigrams)
    assert "Join" not in formatted_plan(c.pairs)
    plan = formatted_plan(pmi_score(c))
    assert "CartesianProduct" not in plan, plan
    bnlj = set(_re.findall(r"BroadcastNestedLoopJoin[^\n(]*\((\d+)\)", plan))
    assert len(bnlj) <= 2, plan


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "e"]), min_size=0, max_size=10
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    min_count=st.integers(min_value=1, max_value=4),
)
def test_pmi_equals_python_model(spark_global, texts, min_count):
    spark = spark_global
    got = {
        (r["a"], r["b"]): (r["pair_cnt"], r["pmi"], r["npmi"])
        for r in pmi_score(pmi_counts(_docs(spark, texts)), min_count).collect()
    }
    want = _py_model(texts, min_count)
    assert set(got) == set(want)
    for k, (c, pmi, npmi) in want.items():
        gc, gp, gn = got[k]
        assert gc == c, k
        assert abs(gp - pmi) < 1e-6, k
        if npmi is None:  # the p(a,b)==1 degenerate corpus
            assert gn is None, k
        else:
            assert abs(gn - npmi) < 1e-6, k


def test_single_bigram_corpus_scores_null_npmi(spark):
    """The hypothesis find, pinned deterministically: a corpus whose one
    pair type carries the whole pair mass (p(a,b) == 1) has no npmi
    normalizer — NULL npmi, finite pmi, no ANSI DIVIDE_BY_ZERO."""
    got = pmi_score(pmi_counts(_docs(spark, ["a a"])), min_count=1).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["a"], r["b"]) == ("a", "a")
    assert r["pmi"] is not None and r["npmi"] is None
