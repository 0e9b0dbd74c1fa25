"""Multimodal-plumbing query (LLM extension): binary payload ->
Arrow-batched mapInPandas feature extraction. The features (byte length,
sha256) are deterministic, so even the pandas-UDF path gets a full DuckDB
oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    attach_media,
    builtin_feature_extract,
    decode_media,
    fake_feature_extract,
    synthesize_media,
)
from ..queries import query
from ..sources.batch import load_table

_MM_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha256
FROM documents
"""


@query("multimodal_feature_extract", oracle=_MM_ORACLE)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-plumbing path (mapInPandas) — exercises the exact batch
    shape a real decoder needs; the Python sha256 is the known stub cost."""
    docs = attach_media(load_table(spark, sf_dir, "documents"))
    return fake_feature_extract(docs)


@query("multimodal_feature_extract_builtin", oracle=_MM_ORACLE)
def q_multimodal_features_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fast-path twin: identical features via JVM built-ins
    (length/sha2), sharing the same oracle — so CORRECTNESS cross-checks
    the Arrow plumbing against the codegen path."""
    docs = attach_media(load_table(spark, sf_dir, "documents"))
    return builtin_feature_extract(docs)


# Real header decode: blobs are REAL PNG/BMP/WAV container headers
# synthesized deterministically from doc_id (pure JVM hex -> unhex); the
# Spark side struct-parses the raw BYTES in mapInPandas; the oracle
# rebuilds the identical blob in DuckDB (printf -> unhex), round-trips it
# through hex(unhex(...)) so parsing reads the binary, and re-extracts
# every field from the byte positions the container formats define.
_DECODE_ORACLE = """
WITH p AS (
  SELECT doc_id,
         CAST(16 + doc_id % 317 AS BIGINT) AS w,
         CAST(16 + doc_id % 211 AS BIGINT) AS h,
         CAST(1 + doc_id % 2 AS BIGINT) AS ch,
         CAST([8000,16000,22050,44100][CAST(doc_id % 4 AS INTEGER) + 1] AS BIGINT) AS sr
  FROM documents
), hxp AS (
  SELECT doc_id,
         printf('%08x', w) AS wbe, printf('%08x', h) AS hbe,
         printf('%08x', sr) AS srbe, printf('%08x', sr * ch * 2) AS brbe,
         printf('%04x', ch) AS chbe, printf('%04x', ch * 2) AS babe
  FROM p
), synth AS (
  SELECT doc_id,
    CASE CAST(doc_id % 3 AS INTEGER)
      WHEN 0 THEN '89504e470d0a1a0a0000000d49484452' || wbe || hbe
                  || '080600000000000000'
      WHEN 1 THEN '424d36000000000000003600000028000000'
           || substr(wbe,7,2)||substr(wbe,5,2)||substr(wbe,3,2)||substr(wbe,1,2)
           || substr(hbe,7,2)||substr(hbe,5,2)||substr(hbe,3,2)||substr(hbe,1,2)
           || '01001800' || repeat('00', 24)
      ELSE '524946462400000057415645666d742010000000' || '0100'
           || substr(chbe,3,2)||substr(chbe,1,2)
           || substr(srbe,7,2)||substr(srbe,5,2)||substr(srbe,3,2)||substr(srbe,1,2)
           || substr(brbe,7,2)||substr(brbe,5,2)||substr(brbe,3,2)||substr(brbe,1,2)
           || substr(babe,3,2)||substr(babe,1,2)
           || '1000' || '6461746100000000'
    END AS hx
  FROM hxp
), blob AS (
  SELECT doc_id, hex(unhex(hx)) AS hs FROM synth
)
SELECT doc_id,
  CASE WHEN substr(hs,1,16)='89504E470D0A1A0A' AND substr(hs,25,8)='49484452' THEN 'png'
       WHEN substr(hs,1,4)='424D' THEN 'bmp'
       WHEN substr(hs,1,8)='52494646' AND substr(hs,17,8)='57415645' THEN 'wav'
       ELSE 'unknown' END AS kind,
  CASE WHEN substr(hs,1,4)='8950' THEN ('0x'||substr(hs,33,8))::BIGINT
       WHEN substr(hs,1,4)='424D' THEN
         ('0x'||substr(hs,43,2)||substr(hs,41,2)||substr(hs,39,2)||substr(hs,37,2))::BIGINT
  END AS width,
  CASE WHEN substr(hs,1,4)='8950' THEN ('0x'||substr(hs,41,8))::BIGINT
       WHEN substr(hs,1,4)='424D' THEN
         ('0x'||substr(hs,51,2)||substr(hs,49,2)||substr(hs,47,2)||substr(hs,45,2))::BIGINT
  END AS height,
  CASE WHEN substr(hs,1,8)='52494646' THEN
         ('0x'||substr(hs,47,2)||substr(hs,45,2))::BIGINT END AS channels,
  CASE WHEN substr(hs,1,8)='52494646' THEN
         ('0x'||substr(hs,55,2)||substr(hs,53,2)||substr(hs,51,2)||substr(hs,49,2))::BIGINT
  END AS sample_rate,
  CASE WHEN substr(hs,1,4)='8950' THEN ('0x'||substr(hs,49,2))::BIGINT
       WHEN substr(hs,1,4)='424D' THEN ('0x'||substr(hs,59,2)||substr(hs,57,2))::BIGINT
       WHEN substr(hs,1,8)='52494646' THEN ('0x'||substr(hs,71,2)||substr(hs,69,2))::BIGINT
  END AS bit_depth
FROM blob
"""


@query("multimodal_decode_dims", oracle=_DECODE_ORACLE)
def q_multimodal_decode_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode (header level): synthesized PNG/BMP/WAV container
    headers, struct-parsed from raw bytes in Arrow-batched mapInPandas —
    dimensions for images, channel layout + sample rate for audio. The
    oracle rebuilds the identical bytes in DuckDB and re-parses every field
    from the hex of the blob, so a decoder reading any wrong byte offset,
    endianness, or field width hash-mismatches."""
    docs = synthesize_media(load_table(spark, sf_dir, "documents").select("doc_id"))
    return decode_media(docs)


_SAMPLE_PLAN_ORACLE = """
WITH w AS (
  SELECT doc_id,
         CAST([8000,16000,22050,44100][CAST(doc_id % 4 AS INTEGER) + 1] AS BIGINT)
           AS sample_rate
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id, sample_rate,
       CAST(t.sample_idx AS BIGINT) AS sample_idx,
       (t.sample_idx * sample_rate * 2) // 4 AS sample_offset
FROM w, range(4) t(sample_idx)
ORDER BY doc_id, sample_idx
"""


@query("media_sample_plan", oracle=_SAMPLE_PLAN_ORACLE)
def q_media_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/sample-sampling PLAN from decoded metadata: the audio docs'
    sample rates are decoded from the container BYTES (real header decode,
    mapInPandas), then each clip gets 4 uniform sample offsets over its
    nominal 2-second span — the computation a frame-sampling/resample
    stage runs before touching the payload (which needs codecs and stays
    out of scope). One row per (doc, sample_idx): decode -> explode ->
    arithmetic, no shuffle. The oracle derives the same sample rates from
    the synthesis parameters — the byte-level decode itself is already
    gated by multimodal_decode_dims."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import decode_media, synthesize_media
    from ..sources.batch import load_table as _lt

    docs = synthesize_media(_lt(spark, sf_dir, "documents").select("doc_id"))
    wav = decode_media(docs).filter(F.col("kind") == "wav")
    return (
        wav.select("doc_id", "sample_rate")
        .withColumn(
            "sample_idx",
            F.explode(F.sequence(F.lit(0).cast("long"), F.lit(3).cast("long"))),
        )
        .withColumn(
            "sample_offset",
            F.expr("(sample_idx * sample_rate * 2) div 4"),
        )
        .orderBy("doc_id", "sample_idx")
    )


# --- JPEG marker-walk decode --------------------------------------------

_JPEG_ORACLE = """
WITH synth AS (
  SELECT doc_id,
    'ffd8' || 'ffe000104a46494600010100000100010000' ||
    'fffe' || printf('%04x', CAST(doc_id % 7 AS INT) + 2)
           || repeat('41', CAST(doc_id % 7 AS INT)) ||
    'ffc0001108' || printf('%04x', CAST(doc_id % 389 AS INT) + 16)
                 || printf('%04x', CAST(doc_id % 509 AS INT) + 16) ||
    '03012200021101031101' || 'ffd9' AS hx
  FROM documents
), blob AS (
  SELECT doc_id, hex(unhex(hx)) AS hs FROM synth
), sof AS (
  SELECT doc_id, hs, position('FFC000' IN hs) AS p FROM blob
)
SELECT doc_id,
       'jpeg' AS kind,
       ('0x' || substr(hs, p + 14, 4))::BIGINT AS width,
       ('0x' || substr(hs, p + 10, 4))::BIGINT AS height,
       CAST(NULL AS BIGINT) AS channels,
       CAST(NULL AS BIGINT) AS sample_rate,
       ('0x' || substr(hs, p + 8, 2))::BIGINT AS bit_depth
FROM sof ORDER BY doc_id
"""


@query("jpeg_decode_dims", oracle=_JPEG_ORACLE)
def q_jpeg_decode_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG header decode via a REAL marker walk: each synthesized file
    carries a variable-length COM segment (doc_id % 7 filler bytes) before
    SOF0, so the frame header sits at a DIFFERENT byte offset per file —
    only a decoder that skips segments by their own length fields (like
    any real JPEG parser) finds the dimensions. The oracle rebuilds the
    identical bytes in DuckDB and locates SOF0 positionally. Same
    Arrow-batched mapInPandas lane as the other decoders; only (id, data)
    is shipped to Python."""
    from ..operators.multimodal import decode_media, synthesize_jpeg

    docs = synthesize_jpeg(load_table(spark, sf_dir, "documents").select("doc_id"))
    return decode_media(docs).orderBy("doc_id")


# --- MP4 (ISO-BMFF) box walk ---------------------------------------------

_MP4_ORACLE = """
WITH p AS (
  SELECT doc_id,
         CAST(doc_id % 3 AS INT) AS k,
         CAST([600,1000,90000,48000][CAST(doc_id % 4 AS INTEGER) + 1] AS BIGINT)
           AS ts,
         CAST(doc_id % 5000 + 100 AS BIGINT) AS dur
  FROM documents
), synth AS (
  SELECT doc_id,
    printf('%08x', 16 + 4*k) || '66747970' || '69736f6d' || '00000200'
      || repeat('69736f6d', k)
      || printf('%08x', 116) || '6d6f6f76'
      || '0000006c' || '6d766864' || '00000000' || '00000000' || '00000000'
      || printf('%08x', ts) || printf('%08x', dur) || repeat('00', 80) AS hx
  FROM p
), blob AS (
  SELECT doc_id, hex(unhex(hx)) AS hs FROM synth
), m AS (
  SELECT doc_id, hs, position('6D766864' IN hs) AS mp FROM blob
)
SELECT doc_id,
       decode(unhex(substr(hs, position('66747970' IN hs) + 8, 8))) AS brand,
       ('0x' || substr(hs, mp + 32, 8))::BIGINT AS timescale,
       ('0x' || substr(hs, mp + 40, 8))::BIGINT AS duration,
       (('0x' || substr(hs, mp + 40, 8))::BIGINT * 1000)
         // ('0x' || substr(hs, mp + 32, 8))::BIGINT AS duration_ms
FROM m ORDER BY doc_id
"""


@query("mp4_decode_duration", oracle=_MP4_ORACLE)
def q_mp4_decode_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/ISO-BMFF container decode via a REAL box walk: each synthesized
    file's ftyp box carries a variable brand list (doc_id % 3 entries), so
    moov sits at a different offset per file and only a walker that
    advances by each box's own size field finds the mvhd timescale +
    duration. Completes the multimodal container set (PNG/BMP/WAV/JPEG +
    video). The oracle rebuilds identical bytes in DuckDB and re-parses
    the fields from the mvhd byte positions. Same Arrow-batched
    mapInPandas lane; only (id, data) reaches Python."""
    from ..operators.multimodal import decode_mp4, synthesize_mp4

    docs = synthesize_mp4(load_table(spark, sf_dir, "documents").select("doc_id"))
    return decode_mp4(docs).orderBy("doc_id")
