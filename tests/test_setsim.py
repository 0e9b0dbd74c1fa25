"""Exact set-similarity join (prefix filtering): planted-pair recall,
exactness against a brute-force recompute, and the loud hot-shingle guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.setsim import allpairs_jaccard_join


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_near_dup_found_and_disjoint_pair_excluded(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    other = "one two three four five six seven eight nine ten"
    out = allpairs_jaccard_join(
        _docs(spark, [(1, base), (2, near), (3, other)]), threshold=0.6
    ).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    # 8 shingles each, 7 shared: J = 7/9
    assert out[0].jaccard == pytest.approx(7 / 9, abs=1e-5)


def test_exactness_vs_bruteforce(spark):
    """Prefix filter must lose nothing: compare with the O(n²) recompute."""
    words = "a b c d e f g h i j k l m n o p".split()
    rows = []
    for i in range(30):
        # overlapping sliding vocab windows -> a range of true Jaccards
        toks = words[i % 6 : i % 6 + 8]
        rows.append((i, " ".join(toks)))
    df = _docs(spark, rows)
    got = {
        (r.id_a, r.id_b)
        for r in allpairs_jaccard_join(df, threshold=0.5).collect()
    }

    import itertools

    def sh(text):
        t = text.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    want = set()
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        sa, sb = sh(ta), sh(tb)
        inter = len(sa & sb)
        if inter * 2 >= (len(sa) + len(sb) - inter):  # J >= 1/2, integer form
            want.add((min(ia, ib), max(ia, ib)))
    assert got == want and want  # non-trivial: some pairs must exist


def test_hot_shingle_guard_fails_loudly(spark):
    # every doc identical -> the (unique) prefix shingle has df == n_docs
    rows = [(i, "x y z w v u t s") for i in range(12)]
    with pytest.raises(Exception, match="max_df"):
        allpairs_jaccard_join(_docs(spark, rows), threshold=0.9, max_df=4).collect()


def test_containment_finds_planted_subset(spark):
    """A short doc fully quoted inside a long one: containment ~1.0 even
    though Jaccard is far below any sane threshold."""
    from flink_stream_processing_spark.operators.setsim import containment_join

    sub = "alpha beta gamma delta epsilon zeta"
    host = sub + " " + " ".join(f"w{i}" for i in range(40))
    other = "one two three four five six seven eight"
    out = containment_join(
        _docs(spark, [(1, sub), (2, host), (3, other)]), threshold=0.8
    ).collect()
    assert [(r.id_sub, r.id_super) for r in out] == [(1, 2)]
    assert out[0].containment == 1.0


def test_allpairs_candidate_volume_scales_linearly(spark):
    """Deterministic scale-slope gate (no timing): disjoint sub-corpora
    must not interact — doubling the corpus with a vocabulary-disjoint
    replica must exactly double the exact pair output. A super-linear
    candidate interaction (e.g. a broken canonical ordering making
    replicas share prefix shingles) would change the pair set, not just
    slow things down."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = []
    for rep in range(2):
        off = rep * 1000
        # per-replica token prefix -> disjoint shingle vocabularies
        rows.append((off + 1, " ".join(f"r{rep}{t}" for t in base.split())))
        rows.append((off + 2, " ".join(f"r{rep}{t}" for t in near.split())))
        rows.append((off + 3, " ".join(f"r{rep}x{i}" for i in range(10))))
    one = allpairs_jaccard_join(_docs(spark, rows[:3]), threshold=0.6).collect()
    two = allpairs_jaccard_join(_docs(spark, rows), threshold=0.6).collect()
    assert len(one) == 1
    assert len(two) == 2 * len(one)
    assert {(r.id_a, r.id_b) for r in two} == {(1, 2), (1001, 1002)}


def test_verify_stage_broadcast_is_demotable(spark):
    """The verify-stage joins must carry NO hard broadcast hint: with the
    planner's broadcast threshold disabled, the physical plan has to fall
    back to shuffle joins keyed on id (a hard ``F.broadcast`` hint is never
    demoted and would broadcast the full shingle-array relation at any
    corpus size — the 100 TB failure mode this test pins shut)."""
    from flink_stream_processing_spark.operators.setsim import containment_join

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    docs = _docs(spark, [(1, base), (2, near)])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        for op, want_rows in ((allpairs_jaccard_join, 1), (containment_join, 2)):
            df = op(docs, threshold=0.6)
            from flink_stream_processing_spark.plans import formatted_plan

            plan = formatted_plan(df)
            assert "BroadcastHashJoin" not in plan, plan
            # and the result itself is still correct under shuffle joins
            rows = df.collect()
            assert len(rows) == want_rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
