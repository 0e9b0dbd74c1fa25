"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step itself (image decode, resize, audio resample, video frame
sampling) needs codec libraries that are NOT in this container — it is
STUBBED behind ``decode_media`` (NotImplementedError) and a deterministic
fake (``fake_feature_extract``). The Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.

Scale design (100 TB):
- Binary payloads stay columnar in parquet; metadata lives beside them so
  filters (mime, size) push down WITHOUT reading the blob column (column
  pruning is the whole game for multimodal tables).
- ``mapInPandas`` streams Arrow record batches; per-batch Python cost is
  amortized over thousands of rows. Batch size is governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.
- Decode is CPU-heavy: ``repartition(target)`` before the map to spread
  blobs evenly (payload-size skew is the common failure).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

# Canonical multimodal column convention: one struct per media object.
MEDIA_SCHEMA = StructType(
    [
        StructField("data", BinaryType()),
        StructField("mime", StringType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Build a media struct column from a text column (deterministic binary
    payload for tests; in production this is the parquet blob column)."""
    return df.withColumn(
        "media",
        F.struct(
            F.encode(F.col(text_col), "UTF-8").alias("data"),
            F.lit(mime).alias("mime"),
            F.create_map(F.lit("origin"), F.lit("inline")).alias("meta"),
        ),
    )


def decode_media(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Real decode (image/audio/video) — requires codec libs not present in
    this container."""
    raise NotImplementedError(
        "media decode requires codec libraries (PIL/ffmpeg) not available "
        "here; use fake_feature_extract for the plumbing path"
    )


def builtin_feature_extract(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """The FAST-PATH twin of fake_feature_extract: the same features via
    pure JVM built-ins (length / sha2), no Python, whole-stage codegen.
    Both paths share one oracle, so the Arrow plumbing and the built-in
    path are cross-checked against each other. Use this form whenever the
    per-row feature is expressible as a column function; reserve
    mapInPandas for real decoders."""
    return df.select(
        F.col(id_col),
        F.length(F.col(f"{media_col}.data")).cast("long").alias("byte_len"),
        F.lower(F.sha2(F.col(f"{media_col}.data"), 256)).alias("sha256"),
    )


def fake_feature_extract(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """Deterministic stand-in for decode/feature-extraction: byte length +
    sha256 of the payload, via Arrow-batched mapInPandas. Exercises the
    exact plumbing a real decoder uses (schema in/out, batch iteration)."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            data = pdf[f"{media_col}.data"] if f"{media_col}.data" in pdf else pdf["data"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": data.map(len).astype("int64"),
                    "sha256": data.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                }
            )

    flat = df.select(F.col(id_col), F.col(f"{media_col}.data").alias("data"))
    return flat.mapInPandas(extract, FEATURE_SCHEMA)
