"""Pure-stdlib audio/video header decoding: parser goldens over
synthesised containers (WAV/FLAC/MP3/MP4), truncation/garbage handling,
and the Spark mapInPandas surface (av_metadata) against the generator
parameters."""

import struct

import pytest

from terrier_spark.datapipe.avmeta import (
    av_metadata,
    make_flac,
    make_mp3,
    make_mp4,
    make_wav,
    parse_av_header,
    synth_av_media,
)


def test_wav_header():
    m = parse_av_header(make_wav(44100, 2, 16, 44100))
    assert m["format"] == "wav" and m["codec"] == "pcm"
    assert (m["channels"], m["sample_rate"], m["bit_depth"]) == (2, 44100, 16)
    assert m["duration_ms"] == 1000
    # mono 8-bit at 8kHz, half a second
    m = parse_av_header(make_wav(8000, 1, 8, 4000))
    assert (m["channels"], m["bit_depth"], m["duration_ms"]) == (1, 8, 500)


def test_wav_walks_past_other_chunks():
    # LIST chunk (odd size -> pad byte) before fmt/data must be skipped
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    data = bytes(32000)
    body = (b"WAVE"
            + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    m = parse_av_header(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (m["sample_rate"], m["duration_ms"]) == (16000, 1000)


def test_flac_streaminfo():
    m = parse_av_header(make_flac(48000, 2, 24, 96000))
    assert m["format"] == "flac"
    assert (m["channels"], m["sample_rate"], m["bit_depth"]) == (2, 48000, 24)
    assert m["duration_ms"] == 2000
    # unknown total samples (0) -> no duration, layout still decoded
    m = parse_av_header(make_flac(44100, 1, 16, 0))
    assert m["duration_ms"] is None and m["sample_rate"] == 44100


def test_mp3_frame_header():
    # index 9 = 128 kbps MPEG1 L3; 32000 bytes -> 2000 ms CBR estimate
    m = parse_av_header(make_mp3(9, 0, 32000))
    assert m["format"] == "mp3" and m["codec"] == "mpeg1_layer3"
    assert (m["sample_rate"], m["channels"]) == (44100, 2)
    assert m["duration_ms"] == 2000
    # mono flag, 48 kHz index, ID3 envelope skipped via syncsafe size
    m = parse_av_header(make_mp3(14, 1, 16000, mono=True,
                                 id3_junk=b"x" * 300))
    assert (m["sample_rate"], m["channels"]) == (48000, 1)
    assert m["duration_ms"] == 16000 * 8 * 1000 // 320000


def test_mp3_resyncs_past_garbage():
    # false sync byte inside the ID3 junk must not be reachable (it is
    # skipped by the syncsafe size); garbage BEFORE a real sync is
    # walked over byte-by-byte
    payload = b"\x00\xff\x00garbage" + make_mp3(9, 0, 4000)
    m = parse_av_header(b"ID3\x04\x00\x00\x00\x00\x00\x00" + payload)
    assert m is not None and m["format"] == "mp3"
    assert m["sample_rate"] == 44100


def test_mp4_boxes():
    m = parse_av_header(make_mp4(90000, 90000 * 7, 1920, 1080))
    assert m["format"] == "mp4" and m["codec"] == "isom"
    assert (m["width"], m["height"], m["duration_ms"]) == (1920, 1080, 7000)
    # audio-only mp4: no tkhd dims
    m = parse_av_header(make_mp4(600, 600 * 3))
    assert (m["width"], m["duration_ms"]) == (None, 3000)


@pytest.mark.parametrize("payload", [
    None, b"", b"garbage bytes", b"RIFF\x00\x00\x00\x00WAVE",
    b"fLaC" + b"\x00" * 4,            # truncated before STREAMINFO
    make_flac(44100, 2, 16, 100)[:20],
    b"\xff\xe0\x00\x00",              # sync with free bitrate: rejected
    b"ID3\x04\x00\x00\x00\x00\x00\x05hello",  # ID3 but no frame sync
])
def test_unparseable_returns_none(payload):
    assert parse_av_header(payload) is None


def test_av_metadata_spark(spark):
    media = synth_av_media(spark, n=40)
    got = {r.media_id: r for r in av_metadata(media).collect()}
    assert len(got) == 40
    for i in range(40):
        r = got[i]
        assert r.format == ["wav", "flac", "mp3", "mp4"][i % 4]
        if i % 4 == 3:
            # video dims must round-trip through the actual boxes
            assert (r.width, r.height) == (160 + 16 * (i % 9),
                                           90 + 18 * (i % 7))
            assert r.duration_ms == (1 + (i % 29)) * 1000
        else:
            assert r.width is None and r.channels >= 1
            assert r.duration_ms > 0


def test_av_metadata_nulls_kept(spark):
    from terrier_spark.datapipe.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(
        [(0, "audio", "audio/wav", None, None, None,
          bytearray(make_wav(8000, 1, 16, 800))),
         (1, "audio", "audio/wav", None, None, None, bytearray(b"junk")),
         (2, "audio", "audio/wav", None, None, None, None)],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in av_metadata(df).collect()}
    assert rows[0].format == "wav" and rows[0].duration_ms == 100
    assert rows[1].format is None and rows[1].sample_rate is None
    assert rows[2].format is None  # null payload kept, not dropped


def test_av_gate_matches_oracle(spark):
    """The gate query and its DuckDB oracle must agree row-for-row (the
    driver's comparison, run locally)."""
    import duckdb

    from terrier_spark.gate_datapipe import _av_meta_sql, q_av_metadata

    got = sorted(
        q_av_metadata(spark, None).collect(), key=lambda r: r.media_id
    )
    exp = duckdb.sql(_av_meta_sql()).fetchall()
    exp = sorted(exp, key=lambda t: t[0])
    assert len(got) == len(exp) == 40
    for r, t in zip(got, exp):
        assert (r.media_id, r.format, r.codec, r.channels, r.sample_rate,
                r.bit_depth, r.duration_ms, r.width, r.height) == t
