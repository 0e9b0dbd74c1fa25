"""Query registry: named queries + DuckDB oracle SQL.

Every operator from SURVEY.md §2 (and the LLM-pipeline extension) registers
here via ``@query(name, oracle=...)``. The driver (and tests/test_oracle_parity)
runs the Spark callable and the oracle SQL side by side at sf0.01 and
compares row count + schema + order-insensitive value hash. Queries whose
semantics aren't SQL-expressible register with ``oracle=None`` (rows-only
check).

Conventions (driver compare is exact):
- alias every computed column identically on both sides;
- round double aggregates to 6 decimals on both sides;
- cast count-ish aggregates to BIGINT on both sides (DuckDB sum(int) is
  HUGEINT otherwise);
- timestamps exported as epoch millis BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def register(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return register


# Import side-effect registration: each module adds its queries on import.
from .queries_impl import (  # noqa: E402,F401
    analytics_extra,
    analytics_graph2,
    analytics_scale,
    corpus_pipeline,
    file_formats,
    governance,
    grouped_pandas,
    llm_corpus_ops,
    llm_dedup,
    llm_dedup2,
    llm_multimodal,
    llm_pipeline2,
    llm_pipeline3,
    llm_pipeline4,
    llm_pipeline5,
    llm_similarity,
    llm_similarity2,
    llm_text,
    recrawl,
    reference_parity,
    relational_core,
    relational_extra,
    relational_olap,
    relational_tpch2,
    reputation,
    retrieval,
    retrieval2,
    sql_surface,
    store_maintenance,
    streaming_maintenance,
    temporal,
    web_dedup_stream,
    windows_extra,
)

