"""Property-based test (hypothesis): the edit-class fuzzy join equals
brute-force Levenshtein on random small vocabularies, at both radii.

The deterministic class tests in test_edge_cases.py cover hand-picked
edit shapes; this sweeps random shapes (repeated characters, shifts,
short strings, empty string) that hand-picking misses. Small alphabet
{a, b, c} maximizes collisions per vocabulary size."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_stream_processing_spark.operators.text import fuzzy_name_pairs


from tests.oracle_utils import brute_levenshtein as _lev


WORD = st.text(alphabet="abc", min_size=0, max_size=6)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vocab=st.sets(WORD, min_size=2, max_size=10), d=st.sampled_from([1, 2]))
def test_fuzzy_pairs_equal_brute_force(spark_global, vocab, d):
    spark = spark_global
    df = spark.createDataFrame([(v,) for v in sorted(vocab)], "name string")
    got = {
        (r.name_a, r.name_b): r.dist
        for r in fuzzy_name_pairs(df, "name", max_dist=d).collect()
    }
    want = {
        (a, b): _lev(a, b)
        for a, b in itertools.combinations(sorted(vocab), 2)
        if _lev(a, b) <= d
    }
    assert got == want
