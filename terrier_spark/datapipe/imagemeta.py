"""Pure-stdlib image METADATA decoding: PNG / JPEG / GIF / BMP header
parsing (format, width, height, bit depth, color mode) from the binary
payload column — no PIL, just struct unpacking of the public container
formats.  This makes the multimodal `binary` column real for the
metadata subset; pixel decoding stays behind the documented
NotImplementedError (terrier_spark/datapipe/multimodal.py).

Format references are the public specifications: PNG (RFC 2083 / ISO
15948) IHDR layout, JPEG (ITU-T T.81) SOFn segment layout, GIF89a
logical screen descriptor, BMP BITMAPINFOHEADER.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}

# SOF markers carrying frame dimensions: C0-CF minus C4 (DHT), C8 (JPG
# extension), CC (DAC) — ITU-T T.81 table B.1
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
_JPEG_MODES = {1: "L", 3: "RGB", 4: "CMYK"}


def parse_image_header(payload: Optional[bytes]) -> Optional[dict]:
    """-> {format, width, height, bit_depth, mode} or None when the
    bytes are not a recognised image container (or are truncated before
    the header fields)."""
    if not payload:
        return None
    b = bytes(payload)
    if b.startswith(_PNG_SIG) and len(b) >= 29 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        depth, color_type = b[24], b[25]
        return {"format": "png", "width": w, "height": h,
                "bit_depth": depth,
                "mode": _PNG_MODES.get(color_type, f"ct{color_type}")}
    if b[:3] in (b"GIF",) and b[3:6] in (b"87a", b"89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        # bits-per-pixel of the global color table, LSD packed byte
        depth = (b[10] & 0x07) + 1 if len(b) >= 11 else 8
        return {"format": "gif", "width": w, "height": h,
                "bit_depth": depth, "mode": "P"}
    if b[:2] == b"BM" and len(b) >= 26:
        hdr_size = struct.unpack("<I", b[14:18])[0]
        if hdr_size >= 40 and len(b) >= 30:   # BITMAPINFOHEADER family
            w, h = struct.unpack("<ii", b[18:26])
            bpp = struct.unpack("<H", b[28:30])[0]
        elif hdr_size == 12:                   # BITMAPCOREHEADER
            w, h = struct.unpack("<HH", b[18:22])
            bpp = struct.unpack("<H", b[24:26])[0]
        else:
            return None
        return {"format": "bmp", "width": int(w), "height": abs(int(h)),
                "bit_depth": int(bpp),
                "mode": "RGB" if bpp >= 16 else "P"}
    if b[:2] == b"\xff\xd8":
        return _parse_jpeg(b)
    return None


def _parse_jpeg(b: bytes) -> Optional[dict]:
    """Walk the segment chain to the first SOFn frame header."""
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:       # not at a marker: corrupt stream
            return None
        marker = b[i + 1]
        if marker == 0xFF:     # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2             # standalone markers, no length field
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if i + 2 + seg_len > n or seg_len < 8:
                return None
            precision = b[i + 4]
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            ncomp = b[i + 9]
            return {"format": "jpeg", "width": w, "height": h,
                    "bit_depth": precision,
                    "mode": _JPEG_MODES.get(ncomp, f"c{ncomp}")}
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF: give up
            return None
        i += 2 + seg_len
    return None


def image_metadata(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """Arrow-batched header parse over a binary media column.
    -> (media_id, format, width, height, bit_depth, mode); unparseable
    payloads yield nulls (kept, not dropped — a curation pipeline
    filters on `format IS NULL`, it doesn't silently lose rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_image_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "format": [m["format"] if m else None for m in metas],
                    "width": pd.array(
                        [m["width"] if m else None for m in metas],
                        dtype="Int32"),
                    "height": pd.array(
                        [m["height"] if m else None for m in metas],
                        dtype="Int32"),
                    "bit_depth": pd.array(
                        [m["bit_depth"] if m else None for m in metas],
                        dtype="Int32"),
                    "mode": [m["mode"] if m else None for m in metas],
                }
            )

    return df.mapInPandas(
        run,
        schema="media_id long, format string, width int, height int, "
               "bit_depth int, mode string",
    )


# --------------------------------------------------------- synth payloads

def make_png(width: int, height: int, bit_depth: int = 8,
             color_type: int = 6, junk: bytes = b"") -> bytes:
    """Minimal structurally-valid PNG: signature + IHDR (correct CRC) +
    arbitrary trailing bytes standing in for the pixel chunks."""
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (_PNG_SIG + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF) + junk)


def make_jpeg(width: int, height: int, progressive: bool = False,
              ncomp: int = 3, junk: bytes = b"") -> bytes:
    """SOI + APP0(JFIF) + SOF0/SOF2 + trailing bytes."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    comps = b"".join(
        bytes([c + 1, 0x11, 0]) for c in range(ncomp)
    )
    sof = struct.pack(">BHHB", 8, height, width, ncomp) + comps
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + sof_marker + struct.pack(">H", len(sof) + 2) + sof
            + junk + b"\xff\xd9")


def make_gif(width: int, height: int, junk: bytes = b"") -> bytes:
    return (b"GIF89a" + struct.pack("<HH", width, height)
            + bytes([0xF7, 0, 0]) + junk + b"\x3b")


def make_bmp(width: int, height: int, bpp: int = 24,
             junk: bytes = b"") -> bytes:
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp,
                       0, 0, 2835, 2835, 0, 0)
    file_hdr = b"BM" + struct.pack("<IHHI", 54 + len(junk), 0, 0, 54)
    return file_hdr + info + junk


def synth_pixel_media(spark, n: int = 30) -> DataFrame:
    """Media table whose payloads are FULLY-VALID encoded images (PNG
    gray/RGB/RGBA across all five scanline filters, 24bpp BMP, GIF) of a
    deterministic pixel field — a pure function of the row id:

        pixel[y, x, c] = (3*x + 7*y + 31*c + 17*i) % 256
        w = 8 + i % 13,  h = 8 + i % 11,  kind = i % 5

    so pixel statistics can be recomputed independently of the codecs
    (the DuckDB gate oracle regenerates the FORMULA; the engine has to
    decode the actual encoded bytes to match it)."""
    from terrier_spark.datapipe.imagecodec import (
        encode_bmp,
        encode_gif,
        encode_png,
    )

    rows = []
    for i in range(n):
        arr = synth_pixel_array(i)
        kind = i % 5
        if kind == 0:
            payload, mime = encode_png(arr, filter_type=i % 5), "image/png"
        elif kind == 1:
            payload, mime = encode_png(arr, filter_type=(i // 5) % 5), \
                "image/png"
        elif kind == 2:
            payload, mime = encode_png(arr, filter_type=(i // 7) % 5), \
                "image/png"
        elif kind == 3:
            payload, mime = encode_bmp(arr), "image/bmp"
        else:
            payload, mime = encode_gif(arr), "image/gif"
        h, w = arr.shape[:2]
        rows.append((i, "image", mime, int(w), int(h), None,
                     bytearray(payload)))
    from terrier_spark.datapipe.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_pixel_array(i: int):
    """The deterministic pixel field behind synth_pixel_media: gray for
    kinds 0 (PNG-L) and 4 (GIF), RGB for kinds 1 (PNG) and 3 (BMP),
    RGBA for kind 2 (PNG)."""
    import numpy as np

    w, h = 8 + i % 13, 8 + i % 11
    kind = i % 5
    channels = {0: None, 1: 3, 2: 4, 3: 3, 4: None}[kind]
    y, x = np.mgrid[0:h, 0:w]
    if channels is None:
        return ((3 * x + 7 * y + 17 * i) % 256).astype(np.uint8)
    c = np.arange(channels)[None, None, :]
    return ((3 * x[:, :, None] + 7 * y[:, :, None] + 31 * c + 17 * i)
            % 256).astype(np.uint8)


def synth_animation_media(spark, n: int = 18) -> DataFrame:
    """Media table of FULLY-VALID animated GIFs: per-row frame count,
    delays and pixel fields are closed-form functions of the row id
    (see synth_animation_frames), so the frame visible at any sampled
    timestamp — and its pixel statistics — can be recomputed without
    the codecs."""
    from terrier_spark.datapipe.imagecodec import encode_gif_animation
    from terrier_spark.datapipe.multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        frames, delays = synth_animation_frames(i)
        payload = encode_gif_animation(frames, delays)
        h, w = frames[0].shape
        rows.append((i, "video", "image/gif", int(w), int(h),
                     int(sum(delays)), bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_animation_frames(i: int):
    """The deterministic animation behind synth_animation_media:

        n_frames = 2 + i % 4,  w = 8 + i % 9,  h = 8 + i % 7
        delays_ms[k] = 40 * (1 + (i + k) % 3)
        frame_k[y, x] = (3*x + 7*y + 17*i + 29*k) % 256  (gray)
    """
    import numpy as np

    n_frames = 2 + i % 4
    w, h = 8 + i % 9, 8 + i % 7
    y, x = np.mgrid[0:h, 0:w]
    frames = [((3 * x + 7 * y + 17 * i + 29 * k) % 256).astype(np.uint8)
              for k in range(n_frames)]
    delays = [40 * (1 + (i + k) % 3) for k in range(n_frames)]
    return frames, delays


def synth_image_media(spark, n: int = 40, seed: int = 42) -> DataFrame:
    """Deterministic media table whose payloads carry REAL container
    headers (dims a pure function of the row id), so header-derived
    columns can be checked against an independently-generated oracle."""
    import hashlib

    rows = []
    for i in range(n):
        w, h = 16 + 7 * (i % 23), 16 + 5 * (i % 31)
        junk = hashlib.sha256(f"img{seed}:{i}".encode()).digest()
        kind = i % 4
        if kind == 0:
            payload, mime = make_png(w, h, junk=junk), "image/png"
        elif kind == 1:
            payload, mime = (
                make_jpeg(w, h, progressive=(i % 8 == 1),
                          ncomp=(1 if i % 8 == 1 else 3), junk=junk),
                "image/jpeg",
            )
        elif kind == 2:
            payload, mime = make_gif(w, h, junk=junk), "image/gif"
        else:
            payload, mime = make_bmp(w, h, junk=junk), "image/bmp"
        rows.append((i, "image", mime, w, h, None, bytearray(payload)))
    from terrier_spark.datapipe.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)
