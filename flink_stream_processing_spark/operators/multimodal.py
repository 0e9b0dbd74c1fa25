"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

``decode_media`` is a REAL dependency-free header decoder: it struct-parses
PNG (IHDR width/height/bit depth), BMP (DIB header dims), WAV (fmt chunk
sample rate/channels/bits), and JPEG (generic marker walk to SOF0-SOF3)
straight from the byte payload — no codec libraries needed. Full pixel/sample decode (resize, resample, frame
sampling) would need codecs absent from this container; that tail is
covered by the deterministic ``fake_feature_extract`` so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is
real and tested end-to-end (tests/test_media_decode.py).

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


# ---------------------------------------------------------------- real decode
#
# Dependency-free media decode: container-header parsing with struct over
# raw bytes — PNG IHDR width/height/bit-depth, BMP DIB width/height/bpp,
# WAV fmt channels/sample-rate/bits. This is the metadata-extraction level
# of decode (the step every multimodal pipeline runs FIRST, to filter/route
# before touching pixels); pixel/sample decode still needs codec libraries
# absent from this container and stays out of scope.

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("bit_depth", LongType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\x0a"


def _decode_header(b: bytes) -> tuple:
    """(kind, width, height, channels, sample_rate, bit_depth) from raw
    container bytes. Pure struct parsing — no codec libraries."""
    import struct

    if len(b) >= 26 and b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h, None, None, b[24])
    if len(b) >= 30 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        (bpp,) = struct.unpack("<H", b[28:30])
        return ("bmp", w, h, None, None, bpp)
    if len(b) >= 36 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        (ch,) = struct.unpack("<H", b[22:24])
        (sr,) = struct.unpack("<I", b[24:28])
        (bits,) = struct.unpack("<H", b[34:36])
        return ("wav", None, None, ch, sr, bits)
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        # JPEG: generic marker walk (APP0/COM/... are skipped via their
        # OWN length fields — segment positions vary per file, so there is
        # no fixed offset to cheat with) until a SOF0-SOF3 frame header.
        i = 2
        while i + 4 <= len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker == 0xD9:  # EOI
                break
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            if 0xC0 <= marker <= 0xC3 and i + 9 <= len(b):
                prec = b[i + 4]
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h, None, None, prec)
            i += 2 + seglen
        return ("jpeg", None, None, None, None, None)
    return ("unknown", None, None, None, None, None)


def decode_media(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Header-level media decode over the binary column via Arrow-batched
    mapInPandas: sniffs the container magic and struct-parses dimensions /
    channel layout / sample rate. Only (id, data) is shipped to Python —
    at 100 TB the projection prunes every other column off the scan."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            decoded = [_decode_header(bytes(b)) for b in pdf["data"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "kind": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "channels": [d[3] for d in decoded],
                    "sample_rate": [d[4] for d in decoded],
                    "bit_depth": [d[5] for d in decoded],
                }
            )

    flat = df.select(F.col(id_col), F.col(f"{media_col}.data").alias("data"))
    return flat.mapInPandas(extract, DECODE_SCHEMA)


def _be32(n) -> "F.Column":
    return F.format_string("%08x", n)


def _le32(n) -> "F.Column":
    be = F.format_string("%08x", n)
    return F.concat(
        F.substring(be, 7, 2), F.substring(be, 5, 2),
        F.substring(be, 3, 2), F.substring(be, 1, 2),
    )


def _le16(n) -> "F.Column":
    be = F.format_string("%04x", n)
    return F.concat(F.substring(be, 3, 2), F.substring(be, 1, 2))


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media blobs from the doc id: one of PNG (33-byte
    signature+IHDR), BMP (54-byte header), or WAV (44-byte canonical RIFF
    header), with dimensions / channels / sample rate derived from the id.
    Header construction is pure JVM expressions (format_string -> unhex),
    so the exact same bytes are reproducible in DuckDB (printf -> unhex)
    for the decode oracle. The blobs are REAL container headers: any
    struct-parsing decoder reads the same fields."""
    doc = F.col(id_col)
    w = (doc % 317 + 16).cast("int")
    h = (doc % 211 + 16).cast("int")
    ch = (doc % 2 + 1).cast("int")
    sr = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(22050), F.lit(44100)),
        (doc % 4 + 1).cast("int"),
    )
    png_hex = F.concat(
        F.lit("89504e470d0a1a0a0000000d49484452"),
        _be32(w), _be32(h), F.lit("080600000000000000"),
    )
    bmp_hex = F.concat(
        F.lit("424d36000000000000003600000028000000"),
        _le32(w), _le32(h), F.lit("01001800"), F.lit("00" * 24),
    )
    wav_hex = F.concat(
        F.lit("524946462400000057415645666d742010000000"),
        F.lit("0100"), _le16(ch), _le32(sr), _le32(sr * ch * 2),
        _le16(ch * 2), F.lit("1000"), F.lit("6461746100000000"),
    )
    hex_col = (
        F.when(doc % 3 == 0, png_hex)
        .when(doc % 3 == 1, bmp_hex)
        .otherwise(wav_hex)
    )
    mime = (
        F.when(doc % 3 == 0, F.lit("image/png"))
        .when(doc % 3 == 1, F.lit("image/bmp"))
        .otherwise(F.lit("audio/wav"))
    )
    return df.withColumn(
        "media",
        F.struct(
            F.unhex(hex_col).alias("data"),
            mime.alias("mime"),
            F.create_map(F.lit("origin"), F.lit("synthesized")).alias("meta"),
        ),
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


def _be16(n) -> "F.Column":
    return F.format_string("%04x", n)


def synthesize_jpeg(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic JPEG headers from the doc id: SOI + APP0(JFIF) + a
    VARIABLE-LENGTH COM segment (doc_id % 7 filler bytes — so the SOF
    offset differs per file and only a real marker walk finds it) + SOF0
    (8-bit precision, height/width from the id, 3 components) + EOI.
    Same JVM-hex construction discipline as ``synthesize_media``: the
    oracle rebuilds identical bytes in DuckDB."""
    doc = F.col(id_col)
    w = (doc % 509 + 16).cast("int")
    h = (doc % 389 + 16).cast("int")
    n_com = (doc % 7).cast("int")
    app0 = F.lit("ffe000104a46494600010100000100010000")
    com = F.concat(
        F.lit("fffe"), _be16(n_com + 2), F.expr(f"repeat('41', cast({id_col} % 7 as int))")
    )
    sof0 = F.concat(
        F.lit("ffc0001108"), _be16(h), _be16(w), F.lit("03012200021101031101")
    )
    hex_col = F.concat(F.lit("ffd8"), app0, com, sof0, F.lit("ffd9"))
    return df.withColumn(
        "media",
        F.struct(
            F.unhex(hex_col).alias("data"),
            F.lit("image/jpeg").alias("mime"),
            F.create_map(F.lit("origin"), F.lit("synthesized")).alias("meta"),
        ),
    )


# ------------------------------------------------------- MP4 (ISO-BMFF) walk

MP4_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("brand", StringType()),
        StructField("timescale", LongType()),
        StructField("duration", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def synthesize_mp4(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic minimal ISO-BMFF (MP4) files from the doc id: an
    ``ftyp`` box with a VARIABLE number of compatible brands (doc_id % 3 —
    so the ``moov`` offset differs per file and only a real box walk finds
    it) followed by ``moov`` containing a version-0 ``mvhd`` with
    timescale/duration derived from the id. Same JVM-hex construction as
    the other synthesizers — the oracle rebuilds identical bytes in
    DuckDB."""
    doc = F.col(id_col)
    k = (doc % 3).cast("int")
    timescale = F.element_at(
        F.array(F.lit(600), F.lit(1000), F.lit(90000), F.lit(48000)),
        (doc % 4 + 1).cast("int"),
    )
    duration = (doc % 5000 + 100).cast("int")
    ftyp = F.concat(
        _be32(F.lit(16) + k * 4),
        F.lit("66747970"),            # 'ftyp'
        F.lit("69736f6d"),            # major brand 'isom'
        F.lit("00000200"),            # minor version
        F.expr(f"repeat('69736f6d', cast({id_col} % 3 as int))"),
    )
    mvhd = F.concat(
        F.lit("0000006c"),            # mvhd box size = 108
        F.lit("6d766864"),            # 'mvhd'
        F.lit("00000000"),            # version 0 + flags
        F.lit("00000000"), F.lit("00000000"),  # ctime, mtime
        _be32(timescale),
        _be32(duration),
        F.lit("00" * 80),             # rate/volume/reserved/matrix/next_track
    )
    moov = F.concat(_be32(F.lit(8 + 108)), F.lit("6d6f6f76"), mvhd)
    return df.withColumn(
        "media",
        F.struct(
            F.unhex(F.concat(ftyp, moov)).alias("data"),
            F.lit("video/mp4").alias("mime"),
            F.create_map(F.lit("origin"), F.lit("synthesized")).alias("meta"),
        ),
    )


def _walk_mp4(data: bytes) -> tuple:
    """Top-level box walk: each box is [u32 size][4-byte type][payload].
    Finds ftyp's major brand positionally and mvhd inside moov by walking
    children — the same traversal any real demuxer front-end performs."""
    import struct

    brand, timescale, duration = None, None, None

    def _box(buf: bytes, off: int, end: int):
        """ISO-BMFF box header incl. the two special sizes: size==0 means
        "extends to the end of the enclosing scope" and size==1 means a
        64-bit largesize follows the type (both per ISO/IEC 14496-12
        §4.2). Returns (payload_start, box_end) or None if malformed.
        box_end is CLAMPED to the enclosing scope, so a truncated file
        whose box declares more bytes than exist never drives a read past
        the buffer — the walk parses what is there and stops."""
        size, _btype = struct.unpack_from(">I4s", buf, off)
        payload = off + 8
        if size == 0:
            return payload, end
        if size == 1:
            if off + 16 > end:
                return None
            (large,) = struct.unpack_from(">Q", buf, off + 8)
            if large < 16:
                return None
            return off + 16, min(off + large, end)
        if size < 8:
            return None
        return payload, min(off + size, end)

    off = 0
    while off + 8 <= len(data):
        hdr = _box(data, off, len(data))
        if hdr is None:
            break
        payload, box_end = hdr
        btype = data[off + 4 : off + 8]
        if btype == b"ftyp":
            brand = data[payload : payload + 4].decode("ascii", "replace")
        elif btype == b"moov":
            c = payload
            while c + 8 <= box_end:
                chdr = _box(data, c, box_end)
                if chdr is None:
                    break
                cpayload, cend = chdr
                if data[c + 4 : c + 8] == b"mvhd" and cpayload < len(data):
                    ver = data[cpayload]
                    if ver == 0 and cpayload + 20 <= len(data):
                        timescale, duration = struct.unpack_from(
                            ">II", data, cpayload + 12
                        )
                    elif ver == 1 and cpayload + 32 <= len(data):
                        timescale, dur64 = struct.unpack_from(
                            ">IQ", data, cpayload + 20
                        )
                        duration = dur64
                c = cend
        off = box_end
    dur_ms = (duration * 1000) // timescale if timescale else None
    return brand, timescale, duration, dur_ms


def decode_mp4(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """MP4 container metadata via the box walk, Arrow-batched mapInPandas;
    only (id, data) is shipped to Python (same pruning discipline as
    decode_media)."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = [_walk_mp4(bytes(b)) for b in pdf["data"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "brand": [r[0] for r in rows],
                    "timescale": [r[1] for r in rows],
                    "duration": [r[2] for r in rows],
                    "duration_ms": [r[3] for r in rows],
                }
            )

    flat = df.select(F.col(id_col), F.col(f"{media_col}.data").alias("data"))
    return flat.mapInPandas(extract, MP4_SCHEMA)
