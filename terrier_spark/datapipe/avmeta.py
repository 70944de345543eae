"""Pure-stdlib audio/video METADATA decoding: WAV / FLAC / MP3 / MP4
header parsing (format, codec, channels, sample rate, bit depth,
duration, video dimensions) from the binary payload column — no
ffmpeg/mutagen, just struct unpacking of the public container formats.

Together with imagemeta.py this makes the multimodal `binary` column
real for the metadata subset across all three media kinds; sample/pixel
decoding stays behind the documented NotImplementedError
(terrier_spark/datapipe/multimodal.py).

Format references are the public specifications: WAVE (RIFF, Microsoft
multimedia spec) `fmt `/`data` chunks, FLAC (RFC 9639) STREAMINFO
block, MPEG-1/2 audio (ISO 11172-3 / 13818-3) frame-sync headers +
ID3v2 envelope, ISO base media (ISO 14496-12) box walk to mvhd/tkhd.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

# --- MPEG audio frame-header tables (ISO 11172-3 / 13818-3, public) ---
# bitrate kbps by [version_group][layer][index]; version_group 0 = MPEG1,
# 1 = MPEG2/2.5; layer index 1..3
_MP3_BITRATE = {
    (0, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# sample rates by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}

_WAV_CODECS = {1: "pcm", 3: "ieee_float", 6: "alaw", 7: "mulaw",
               0xFFFE: "extensible"}


def parse_av_header(payload: Optional[bytes]) -> Optional[dict]:
    """-> {format, codec, channels, sample_rate, bit_depth, duration_ms,
    width, height} (absent fields None) or None when the bytes are not a
    recognised audio/video container (or are truncated before the header
    fields)."""
    if not payload:
        return None
    b = bytes(payload)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return _parse_wav(b)
    if b[:4] == b"fLaC":
        return _parse_flac(b)
    if len(b) >= 8 and b[4:8] == b"ftyp":
        return _parse_mp4(b)
    if b[:3] == b"ID3" or (len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
        return _parse_mp3(b)
    return None


def _meta(format, codec=None, channels=None, sample_rate=None,
          bit_depth=None, duration_ms=None, width=None, height=None):
    return {"format": format, "codec": codec, "channels": channels,
            "sample_rate": sample_rate, "bit_depth": bit_depth,
            "duration_ms": duration_ms, "width": width, "height": height}


def _parse_wav(b: bytes) -> Optional[dict]:
    """RIFF chunk walk to `fmt ` (codec/layout) and `data` (duration)."""
    i, n = 12, len(b)
    fmt = None
    data_size = None
    while i + 8 <= n:
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"fmt " and size >= 16 and i + 8 + 16 <= n:
            audio_fmt, channels, rate, byte_rate, _align, bps = \
                struct.unpack("<HHIIHH", b[i + 8:i + 24])
            fmt = (audio_fmt, channels, rate, byte_rate, bps)
        elif cid == b"data":
            data_size = size
        # chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size + (size & 1)
    if fmt is None:
        return None
    audio_fmt, channels, rate, byte_rate, bps = fmt
    dur = None
    if data_size is not None and byte_rate > 0:
        dur = data_size * 1000 // byte_rate
    return _meta("wav", codec=_WAV_CODECS.get(audio_fmt, f"fmt{audio_fmt}"),
                 channels=channels, sample_rate=rate, bit_depth=bps,
                 duration_ms=dur)


def _parse_flac(b: bytes) -> Optional[dict]:
    """STREAMINFO is required to be the first metadata block (RFC 9639
    §8.1); its packed 8-byte field carries rate/channels/bps/samples."""
    if len(b) < 8 + 34:
        return None
    btype = b[4] & 0x7F
    blen = int.from_bytes(b[5:8], "big")
    if btype != 0 or blen < 34:
        return None
    s = b[8:8 + 34]
    packed = int.from_bytes(s[10:18], "big")  # 64 bits
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total_samples = packed & ((1 << 36) - 1)
    if sample_rate == 0:
        return None
    dur = total_samples * 1000 // sample_rate if total_samples else None
    return _meta("flac", codec="flac", channels=channels,
                 sample_rate=sample_rate, bit_depth=bps, duration_ms=dur)


def _parse_mp3(b: bytes) -> Optional[dict]:
    """Skip an ID3v2 envelope (syncsafe size), find the first frame
    sync, read version/layer/bitrate/rate from the public tables; the
    duration is the CBR estimate audio_bytes * 8 / bitrate (what a tag
    reader reports for unindexed CBR streams)."""
    i, n = 0, len(b)
    if b[:3] == b"ID3" and n >= 10:
        size = 0
        for k in range(6, 10):       # syncsafe: 7 bits per byte
            size = (size << 7) | (b[k] & 0x7F)
        i = 10 + size
    while i + 4 <= n:
        if b[i] == 0xFF and (b[i + 1] & 0xE0) == 0xE0:
            hdr = b[i:i + 4]
            ver_bits = (hdr[1] >> 3) & 0x3
            layer_bits = (hdr[1] >> 1) & 0x3
            if ver_bits == 1 or layer_bits == 0:
                i += 1
                continue
            layer = 4 - layer_bits          # 1..3
            vgroup = 0 if ver_bits == 3 else 1
            br_idx = (hdr[2] >> 4) & 0xF
            sr_idx = (hdr[2] >> 2) & 0x3
            if br_idx in (0, 15) or sr_idx == 3:
                i += 1
                continue
            kbps = _MP3_BITRATE[(vgroup, layer)][br_idx]
            rate = _MP3_RATES[ver_bits][sr_idx]
            audio_bytes = n - i
            dur = audio_bytes * 8 * 1000 // (kbps * 1000)
            return _meta("mp3", codec=f"mpeg{1 if ver_bits == 3 else 2}"
                                       f"_layer{layer}",
                         channels=1 if ((hdr[3] >> 6) & 0x3) == 3 else 2,
                         sample_rate=rate, bit_depth=None, duration_ms=dur)
        i += 1
    return None


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the sibling boxes in
    b[start:end]; tolerant of a truncated final box."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", b[i:i + 4])[0]
        btype = b[i + 4:i + 8]
        body = i + 8
        if size == 1:                # 64-bit largesize
            if i + 16 > end:
                return
            size = struct.unpack(">Q", b[i + 8:i + 16])[0]
            body = i + 16
        elif size == 0:              # box extends to EOF
            size = end - i
        if size < 8:
            return
        yield btype, body, min(i + size, end)
        i += size


def _parse_mp4(b: bytes) -> Optional[dict]:
    """ISO-BMFF walk: ftyp brand -> moov/mvhd (timescale+duration) and
    the first visual trak's tkhd (16.16 fixed-point width/height)."""
    meta = _meta("mp4", codec=None)
    brand = b[8:12].decode("latin1").strip() if len(b) >= 12 else None
    meta["codec"] = brand or None
    for btype, s, e in _mp4_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ityp, is_, ie in _mp4_boxes(b, s, e):
            if ityp == b"mvhd" and ie - is_ >= 20:
                ver = b[is_]
                if ver == 1 and ie - is_ >= 28:
                    timescale = struct.unpack(">I", b[is_ + 20:is_ + 24])[0]
                    duration = struct.unpack(">Q", b[is_ + 24:is_ + 32])[0]
                else:
                    timescale, duration = struct.unpack(
                        ">II", b[is_ + 12:is_ + 20])
                if timescale:
                    meta["duration_ms"] = duration * 1000 // timescale
            elif ityp == b"trak":
                for ttyp, ts, te in _mp4_boxes(b, is_, ie):
                    if ttyp != b"tkhd":
                        continue
                    ver = b[ts]
                    off = ts + (88 if ver == 1 else 76)
                    if off + 8 <= te:
                        w_fp, h_fp = struct.unpack(">II", b[off:off + 8])
                        if w_fp and h_fp and meta["width"] is None:
                            meta["width"] = w_fp >> 16
                            meta["height"] = h_fp >> 16
        return meta
    return meta


def av_metadata(df: DataFrame, payload_col: str = "payload",
                id_col: str = "media_id") -> DataFrame:
    """Arrow-batched header parse over a binary media column.
    -> (media_id, format, codec, channels, sample_rate, bit_depth,
    duration_ms, width, height); unparseable payloads yield nulls
    (kept, not dropped — a curation pipeline filters on
    `format IS NULL`, it doesn't silently lose rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_av_header(p) for p in pdf[payload_col]]

            def col(key, dtype):
                return pd.array([m[key] if m else None for m in metas],
                                dtype=dtype)

            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "format": [m["format"] if m else None for m in metas],
                    "codec": [m["codec"] if m else None for m in metas],
                    "channels": col("channels", "Int32"),
                    "sample_rate": col("sample_rate", "Int32"),
                    "bit_depth": col("bit_depth", "Int32"),
                    "duration_ms": col("duration_ms", "Int64"),
                    "width": col("width", "Int32"),
                    "height": col("height", "Int32"),
                }
            )

    return df.mapInPandas(
        run,
        schema="media_id long, format string, codec string, channels int, "
               "sample_rate int, bit_depth int, duration_ms long, "
               "width int, height int",
    )


# --------------------------------------------------------- synth payloads

def make_wav(sample_rate: int, channels: int, bits: int,
             n_samples: int) -> bytes:
    """Structurally-valid PCM WAVE: RIFF + fmt + data (zero samples of
    the exact byte length, so duration derives from real chunk sizes)."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = bytes(n_samples * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_flac(sample_rate: int, channels: int, bps: int,
              total_samples: int, junk: bytes = b"") -> bytes:
    """fLaC marker + last-flag STREAMINFO block + junk frame bytes."""
    packed = ((sample_rate << 44) | ((channels - 1) << 41)
              | ((bps - 1) << 36) | total_samples)
    streaminfo = (struct.pack(">HH", 4096, 4096)
                  + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
                  + packed.to_bytes(8, "big") + bytes(16))
    assert len(streaminfo) == 34
    return (b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
            + streaminfo + junk)


def make_mp3(kbps_index: int, sr_index: int, audio_bytes: int,
             mono: bool = False, id3_junk: bytes = b"") -> bytes:
    """ID3v2 envelope (syncsafe-sized junk) + an MPEG1 Layer III frame
    sync header followed by filler up to audio_bytes total."""
    assert len(id3_junk) < 1 << 21
    size = len(id3_junk)
    syncsafe = bytes(((size >> s) & 0x7F) for s in (21, 14, 7, 0))
    id3 = b"ID3\x04\x00\x00" + syncsafe + id3_junk
    hdr = bytes([
        0xFF,
        0xE0 | (3 << 3) | (1 << 1),              # MPEG1, Layer III
        (kbps_index << 4) | (sr_index << 2),
        (0x3 << 6) if mono else 0x00,
    ])
    assert audio_bytes >= 4
    return id3 + hdr + bytes(audio_bytes - 4)


def make_mp4(timescale: int, duration: int, width: int = 0,
             height: int = 0, junk: bytes = b"") -> bytes:
    """ftyp + moov(mvhd [+ trak(tkhd)]) + mdat-shaped junk."""
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = box(b"mvhd", bytes(4) + bytes(8)
               + struct.pack(">II", timescale, duration) + bytes(80))
    moov_body = mvhd
    if width and height:
        tkhd = box(b"tkhd", bytes(4) + bytes(72)
                   + struct.pack(">II", width << 16, height << 16))
        moov_body += box(b"trak", tkhd)
    return (box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
            + box(b"moov", moov_body)
            + box(b"mdat", junk))


def synth_av_media(spark, n: int = 40, seed: int = 7) -> DataFrame:
    """Deterministic media table whose payloads carry REAL audio/video
    container headers (parameters a pure function of the row id), so
    header-derived columns can be checked against an independently
    generated oracle.  Mirrors synth_image_media (imagemeta.py)."""
    import hashlib

    rows = []
    for i in range(n):
        junk = hashlib.sha256(f"av{seed}:{i}".encode()).digest()
        kind = i % 4
        if kind == 0:
            rate = (8000, 16000, 44100, 48000)[(i // 4) % 4]
            channels, bits = 1 + (i % 2), (8, 16, 24, 32)[(i // 8) % 4]
            n_samples = 100 + 37 * (i % 11)
            payload, mime, mkind = make_wav(rate, channels, bits,
                                            n_samples), "audio/wav", "audio"
            dur = n_samples * 1000 // rate
        elif kind == 1:
            rate = (22050, 44100, 48000, 96000)[(i // 4) % 4]
            channels, bps = 1 + (i % 3), (16, 24)[(i // 8) % 2]
            total = 1000 + 503 * (i % 13)
            payload, mime, mkind = make_flac(rate, channels, bps, total,
                                             junk), "audio/flac", "audio"
            dur = total * 1000 // rate
        elif kind == 2:
            kbps_index = 1 + (i % 14)
            sr_index = (i // 4) % 3
            audio_bytes = 2000 + 997 * (i % 7)
            payload, mime, mkind = make_mp3(kbps_index, sr_index,
                                            audio_bytes, mono=(i % 8 == 2),
                                            id3_junk=junk), \
                "audio/mpeg", "audio"
            kbps = _MP3_BITRATE[(0, 3)][kbps_index]
            dur = audio_bytes * 8 * 1000 // (kbps * 1000)
        else:
            timescale = (1000, 90000, 600, 48000)[(i // 4) % 4]
            secs = 1 + (i % 29)
            w, h = 160 + 16 * (i % 9), 90 + 18 * (i % 7)
            payload, mime, mkind = make_mp4(timescale, secs * timescale,
                                            w, h, junk), "video/mp4", "video"
            dur = secs * 1000
        rows.append((i, mkind, mime, None, None, dur, bytearray(payload)))
    from terrier_spark.datapipe.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)
