"""PySpark-native analytics engine with the capabilities of
``imanishkarki/flink-stream-processing`` (reference at /root/reference,
read-only), re-expressed Spark-first.

Layout
------
- ``session``   : SparkSession factory tuned for local tests / cluster scale
- ``schemas``   : fixed StructTypes (reference DTOs + driver test tables)
- ``sources``   : batch parquet, rate-source synthetic generator, Kafka (gated)
- ``operators`` : the operator library — windowed metrics (flagship), risk
                  labeling, JSON ops, relational core, dedup, similarity,
                  text analysis, multimodal plumbing
- ``streaming`` : Structured Streaming pipelines (watermarks, stateful window
                  agg, foreachBatch JDBC sink, query-progress metrics)
- ``plans``     : plan-inspection helpers (explain checks used by tests)
"""

__version__ = "0.1.0"
