"""BPE tokenizer training + encoding — the full iterative loop behind
the registered one-iteration row (r19 library capability,
post-saturation policy: no registry entry; laws + hypothesis sweep vs
an exact Python reference + scale rung; the single-iteration pair count
keeps its registered DuckDB oracle in `bpe_merge_candidates`).

Algorithm: byte-pair encoding as specified for NMT subword units
(Sennrich, Haddow & Birch, "Neural machine translation of rare words
with subword units", ACL 2016, Algorithm 1): start from characters,
repeatedly (1) count adjacent symbol pairs over the word-frequency
table, (2) merge the most frequent pair everywhere, left-to-right
non-overlapping. The reference leaves ties arbitrary; here the
tie-break is PINNED — max count, then lexicographically smallest
(a, b) — so training is a pure function of the corpus and the exact
Python model can assert merge-list equality, not merely vocab overlap.
(No end-of-word marker, matching the registered candidate row's
convention; a production tokenizer adds one by pre-transforming the
word column — the algebra is unchanged.)

THE 100 TB FACTORIZATION (why this is tractable at corpus scale):
training never iterates over the corpus. The ONE corpus-scale job is
the word-frequency aggregate (`bpe_word_freqs` — map-side combined,
mergeable by keyed sum, so shards/days fold in without re-scans
exactly like the LM counts one module over). Every training iteration
then runs on the VOCABULARY-sized (word, freq, pieces) frame — orders
of magnitude smaller — with one pair-count aggregate and one in-array
merge rewrite per iteration, checkpointed per step (the package's
iterative-operator convention: kmeans/pagerank/CC). The per-iteration
argmax is ONE collected row (the merge being learned IS the output —
driver traffic is O(n_merges), the same shape as kmeans' centroids).

Encoding (`bpe_encode`) replays the merge list per word in ONE corpus
scan with zero joins: the merge table rides in as a collected-array
scalar through the package's broadcast-crossJoin convention, and the
replay is a nested higher-order fold (aggregate over merges, inner
aggregate over pieces) — all JVM expressions, no UDFs, no shuffle
beyond the scan itself.

LAWS (test-pinned in tests/test_bpe.py):
- exact-reference equality: merge list AND final piece decomposition
  equal the Python reference implementation on random corpora
  (hypothesis sweep) — list equality, order included;
- word-freq merge lossless: sharded `bpe_word_freqs` summed == whole;
- encode/train consistency: encoding the training words with the
  learned merges reproduces the trained `pieces` exactly;
- reconstruction: concat(pieces) == word for every word, at every
  n_merges (encoding never loses characters);
- zero merges == character split; enough merges collapses every
  training word to one piece;
- first learned merge == the registered `bpe_merge_candidates` row 1
  (the two surfaces can never disagree on iteration 1).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class BPEModel(NamedTuple):
    merges: list[tuple[str, str]]  # learned merge list, in training order
    vocab: DataFrame  # (word, freq, pieces array<string>) — trained state


def bpe_word_freqs(corpus: DataFrame, text: str = "text") -> DataFrame:
    """(word, freq) over the package tokenization — THE corpus-scale
    aggregate (everything after it is vocabulary-sized). Mergeable by
    keyed sum; empty words (the split('') == [''] convention) carry no
    pairs and encode to their single empty piece, so they stay."""
    return (
        corpus.select(
            F.explode(F.split(F.lower(F.trim(F.col(text))), r"\s+")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def bpe_freq_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge shard/day word-frequency tables: one keyed sum — lossless,
    the LM-counts maintenance story."""
    return (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.sum("freq").cast("long").alias("freq"))
    )


def _chars(word) -> Column:
    """Codepoint split (substring is codepoint-based — the unicode pin
    the fuzzy operators established). The EMPTY word — real under the
    package tokenization, where an empty doc yields one empty token —
    splits to a single empty piece (array('')), keeping concat(pieces)
    == word; the guard matters because Spark's sequence(1, 0) counts
    DOWN ([1, 0]), it does not return an empty range."""
    return F.expr(
        f"CASE WHEN char_length({word}) = 0 THEN array('') "
        f"ELSE transform(sequence(1, char_length({word})), "
        f"i -> substring({word}, i, 1)) END"
    )


def _merge_pass(pieces: Column, a: Column, b: Column) -> Column:
    """One left-to-right non-overlapping merge of the pair (a, b) inside
    a pieces array — the fold CANNOT re-match its own output in the
    same pass (the merged symbol a||b differs from a unless b is empty,
    and empty symbols never arise from a character split)."""
    return F.aggregate(
        pieces,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent piece pairs weighted by word frequency —
    the aggregate each iteration maximizes (the registered
    `bpe_merge_candidates` shape, over pieces instead of characters)."""
    return (
        vocab.filter(F.size("pieces") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(pieces) - 1), "
                    "i -> struct(element_at(pieces, i) AS a, "
                    "element_at(pieces, i + 1) AS b))"
                )
            ).alias("p"),
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def bpe_train(word_freqs: DataFrame, n_merges: int) -> BPEModel:
    """Learn up to ``n_merges`` merges from a (word, freq) table.
    Iterative driver loop over the vocabulary-sized state (the
    kmeans/pagerank convention): each step is one pair-count aggregate,
    ONE collected argmax row (cnt desc, then (a, b) asc — the pinned
    tie-break), and one in-array merge rewrite, checkpointed so the
    plan never deepens. Stops early when no adjacent pair remains."""
    vocab = word_freqs.select(
        "word", "freq", _chars("word").alias("pieces")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # the package never .collect()s unbounded results; .take(1) is
        # the audited bounded driver exchange (the kmeans_fit idiom) —
        # the merge being learned IS the output, one row per iteration
        best = _pair_counts(vocab).orderBy(F.desc("cnt"), "a", "b").take(1)
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn(
            "pieces", _merge_pass(F.col("pieces"), F.lit(a), F.lit(b))
        ).localCheckpoint(eager=True)
    return BPEModel(merges=merges, vocab=vocab)


def bpe_merges_df(model: BPEModel, spark) -> DataFrame:
    """(rank, a, b) — the persistable merge table (what ships to the
    tokenizer; rank is the replay order)."""
    if not model.merges:
        return spark.createDataFrame([], "rank long, a string, b string")
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(model.merges)],
        "rank long, a string, b string",
    )


def bpe_encode(
    words: DataFrame, merges: DataFrame, word_col: str = "word"
) -> DataFrame:
    """Append ``pieces``: replay the merge table in rank order over each
    word — ONE scan of ``words``, zero joins (the merge list rides in as
    a sorted collected-array scalar via the broadcast-crossJoin
    convention), nested higher-order fold does the replay in the JVM."""
    mlist = F.broadcast(
        merges.agg(
            F.coalesce(
                F.array_sort(
                    F.collect_list(F.struct("rank", "a", "b"))
                ),
                F.array().cast(
                    "array<struct<rank:bigint,a:string,b:string>>"
                ),
            ).alias("_merges")
        )
    )
    return (
        words.crossJoin(mlist)
        .withColumn(
            "pieces",
            F.aggregate(
                F.col("_merges"),
                _chars(word_col),
                lambda pieces, m: _merge_pass(
                    pieces, m.getField("a"), m.getField("b")
                ),
            ),
        )
        .drop("_merges")
    )
