"""Unit tests for the header-level media decoder: the byte parser is checked
against container headers built independently with struct.pack (not the
Spark/DuckDB synthesis expressions), so the decoder and the synthesizer
can't share a common wrong offset."""

from __future__ import annotations

import struct

from flink_stream_processing_spark.operators.multimodal import _decode_header


def _png(w: int, h: int, bit_depth: int = 8) -> bytes:
    ihdr = struct.pack(">II5B", w, h, bit_depth, 6, 0, 0, 0)
    return b"\x89PNG\r\n\x1a\x0a" + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4


def _bmp(w: int, h: int, bpp: int = 24) -> bytes:
    return (
        b"BM"
        + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHH", 40, w, h, 1, bpp)
        + b"\x00" * 24
    )


def _wav(ch: int, sr: int, bits: int = 16) -> bytes:
    return (
        b"RIFF"
        + struct.pack("<I", 36)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ch * bits // 8, ch * bits // 8, bits)
        + b"data"
        + struct.pack("<I", 0)
    )


def test_png_dims():
    assert _decode_header(_png(1920, 1080)) == ("png", 1920, 1080, None, None, 8)
    assert _decode_header(_png(1, 1, 16)) == ("png", 1, 1, None, None, 16)


def test_bmp_dims():
    assert _decode_header(_bmp(640, 480)) == ("bmp", 640, 480, None, None, 24)
    assert _decode_header(_bmp(333, 211, 32)) == ("bmp", 333, 211, None, None, 32)


def test_wav_fmt():
    assert _decode_header(_wav(2, 44100)) == ("wav", None, None, 2, 44100, 16)
    assert _decode_header(_wav(1, 8000, 8)) == ("wav", None, None, 1, 8000, 8)


def test_garbage_and_truncated_are_unknown():
    unknown = ("unknown", None, None, None, None, None)
    assert _decode_header(b"") == unknown
    assert _decode_header(b"\x00" * 100) == unknown
    assert _decode_header(_png(10, 10)[:12]) == unknown  # truncated PNG
    assert _decode_header(b"RIFFxxxx????" + b"\x00" * 30) == unknown  # not WAVE


def test_decode_media_over_spark(spark):
    """End-to-end through mapInPandas on a mixed in-memory frame."""
    rows = [(0, _png(100, 50)), (1, _bmp(20, 30)), (2, _wav(2, 22050)), (3, b"junk")]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    from pyspark.sql import functions as F

    from flink_stream_processing_spark.operators.multimodal import decode_media

    media = df.select(
        "doc_id",
        F.struct(
            F.col("data"), F.lit("x").alias("mime"),
            F.create_map().cast("map<string,string>").alias("meta"),
        ).alias("media"),
    )
    got = {r.doc_id: r for r in decode_media(media).collect()}
    assert (got[0].kind, got[0].width, got[0].height) == ("png", 100, 50)
    assert (got[1].kind, got[1].width, got[1].height) == ("bmp", 20, 30)
    assert (got[2].kind, got[2].channels, got[2].sample_rate) == ("wav", 2, 22050)
    assert got[3].kind == "unknown"


# --- JPEG marker walk ----------------------------------------------------

def test_jpeg_marker_walk_decodes_dims():
    from flink_stream_processing_spark.operators.multimodal import _decode_header

    # SOI + APP0 + 3-byte COM + SOF0(h=0x0100, w=0x0200) + EOI
    b = bytes.fromhex(
        "ffd8" "ffe000104a46494600010100000100010000"
        "fffe0005414141"
        "ffc0001108" "0100" "0200" "03012200021101031101" "ffd9"
    )
    assert _decode_header(b) == ("jpeg", 0x0200, 0x0100, None, None, 8)


def test_jpeg_without_sof_yields_nulls():
    from flink_stream_processing_spark.operators.multimodal import _decode_header

    # COM whose declared length overruns into EOI: walk finds no SOF
    kind, w, h, ch, sr, bd = _decode_header(bytes.fromhex("ffd8fffe00024141ffd9"))
    assert kind == "jpeg" and w is None and h is None


def test_jpeg_progressive_sof2_also_parsed():
    from flink_stream_processing_spark.operators.multimodal import _decode_header

    b = bytes.fromhex("ffd8" "ffc2001108" "0040" "0080" "03012200021101031101" "ffd9")
    assert _decode_header(b) == ("jpeg", 0x80, 0x40, None, None, 8)


def test_mp4_box_walk_variable_ftyp(spark):
    """The walker must find moov regardless of ftyp length, and ignore
    truncated/garbage payloads without raising."""
    from flink_stream_processing_spark.operators.multimodal import (
        _walk_mp4,
        decode_mp4,
        synthesize_mp4,
    )

    df = spark.range(0, 9).withColumnRenamed("id", "doc_id")
    out = {r.doc_id: r for r in decode_mp4(synthesize_mp4(df)).collect()}
    assert len(out) == 9
    for i, r in out.items():
        assert r.brand == "isom"
        assert r.timescale == [600, 1000, 90000, 48000][i % 4]
        assert r.duration == i % 5000 + 100
        assert r.duration_ms == (r.duration * 1000) // r.timescale

    assert _walk_mp4(b"") == (None, None, None, None)
    assert _walk_mp4(b"\x00\x00\x00\x01xxxx") == (None, None, None, None)


def test_mp4_special_box_sizes_and_v1_mvhd():
    """ISO-BMFF size==1 (64-bit largesize), size==0 (box to EOF), and a
    version-1 mvhd (64-bit times) — the real-world encodings a demuxer
    meets that the synthesized corpus never uses."""
    import struct

    from flink_stream_processing_spark.operators.multimodal import _walk_mp4

    # ftyp with largesize: [size=1]['ftyp'][u64 largesize][brand][minor]
    ftyp_payload = b"avc1" + b"\x00\x00\x02\x00"
    ftyp = (
        struct.pack(">I4s", 1, b"ftyp")
        + struct.pack(">Q", 16 + len(ftyp_payload))
        + ftyp_payload
    )
    # v1 mvhd: ver=1+flags, ctime u64, mtime u64, timescale u32, dur u64
    mvhd_payload = (
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">IQ", 90000, 123456)
        + b"\x00" * 80
    )
    mvhd = struct.pack(">I4s", 8 + len(mvhd_payload), b"mvhd") + mvhd_payload
    # moov with size==0: extends to EOF (must be last top-level box)
    moov = struct.pack(">I4s", 0, b"moov") + mvhd
    brand, timescale, duration, dur_ms = _walk_mp4(ftyp + moov)
    assert brand == "avc1"
    assert timescale == 90000
    assert duration == 123456
    assert dur_ms == (123456 * 1000) // 90000
    # malformed largesize < 16 must stop cleanly, not loop or raise
    bad = struct.pack(">I4s", 1, b"ftyp") + struct.pack(">Q", 8)
    assert _walk_mp4(bad) == (None, None, None, None)


def test_mp4_truncated_boxes_stop_cleanly():
    """Boxes whose declared size exceeds the buffer (truncated downloads)
    must parse what exists and stop — never read past the end or raise."""
    import struct

    from flink_stream_processing_spark.operators.multimodal import _walk_mp4

    # moov declares 1000 bytes but the file ends after a cut mvhd header
    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"isom" + b"\x00\x00\x02\x00"
    moov = struct.pack(">I4s", 1000, b"moov") + struct.pack(">I4s", 108, b"mvhd") + b"\x00" * 10
    out = _walk_mp4(ftyp + moov)
    assert out[0] == "isom" and out[1] is None and out[2] is None

    # v1 mvhd cut before its 64-bit duration
    mvhd_v1_cut = (
        struct.pack(">I4s", 120, b"mvhd") + b"\x01\x00\x00\x00" + b"\x00" * 8
    )
    moov2 = struct.pack(">I4s", 0, b"moov") + mvhd_v1_cut
    assert _walk_mp4(moov2) == (None, None, None, None)

    # largesize lying beyond EOF: clamped, not overread
    big = struct.pack(">I4s", 1, b"ftyp") + struct.pack(">Q", 10_000) + b"avc1"
    assert _walk_mp4(big)[0] == "avc1"
