"""Pure-stdlib image header decoding: parser goldens over synthesised
containers, truncation/garbage handling, and the Spark mapInPandas
surface (image_metadata) against the gate oracle's expected values."""

import pytest

from terrier_spark.datapipe.imagemeta import (
    image_metadata,
    make_bmp,
    make_gif,
    make_jpeg,
    make_png,
    parse_image_header,
    synth_image_media,
)


def test_png_header():
    m = parse_image_header(make_png(640, 480))
    assert m == {"format": "png", "width": 640, "height": 480,
                 "bit_depth": 8, "mode": "RGBA"}
    # grayscale 16-bit
    m = parse_image_header(make_png(3, 7, bit_depth=16, color_type=0))
    assert (m["mode"], m["bit_depth"]) == ("L", 16)
    # palette
    assert parse_image_header(make_png(5, 5, color_type=3))["mode"] == "P"


def test_jpeg_baseline_and_progressive():
    m = parse_image_header(make_jpeg(320, 240))
    assert m == {"format": "jpeg", "width": 320, "height": 240,
                 "bit_depth": 8, "mode": "RGB"}
    # progressive (SOF2) and grayscale single-component
    m = parse_image_header(make_jpeg(21, 12, progressive=True, ncomp=1))
    assert (m["width"], m["height"], m["mode"]) == (21, 12, "L")
    # CMYK 4-component
    assert parse_image_header(make_jpeg(8, 8, ncomp=4))["mode"] == "CMYK"


def test_jpeg_walks_past_other_segments():
    # DQT + DHT + COM segments before the SOF must be skipped, and a
    # restart marker (standalone, no length) must not derail the walk
    body = (b"\xff\xd8"
            + b"\xff\xdb\x00\x05abc"        # DQT
            + b"\xff\xc4\x00\x04ab"         # DHT (0xC4 is NOT a SOF)
            + b"\xff\xfe\x00\x06comm"       # COM
            + b"\xff\xc0\x00\x0b\x08\x00\x64\x00\x32\x01\x01\x11\x00"
            + b"\xff\xd9")
    m = parse_image_header(body)
    assert (m["width"], m["height"]) == (50, 100)


def test_gif_and_bmp():
    assert parse_image_header(make_gif(99, 77)) == {
        "format": "gif", "width": 99, "height": 77,
        "bit_depth": 8, "mode": "P"}
    m = parse_image_header(make_bmp(12, 34))
    assert (m["format"], m["width"], m["height"], m["bit_depth"]) == (
        "bmp", 12, 34, 24)
    # top-down BMP stores negative height; 8bpp is palette mode
    m = parse_image_header(make_bmp(10, -20, bpp=8))
    assert (m["height"], m["mode"]) == (20, "P")


@pytest.mark.parametrize("payload", [
    None, b"", b"garbage bytes", b"\x89PNG\r\n\x1a\n" + b"short",
    make_png(9, 9)[:20], make_jpeg(9, 9)[:3], b"GIF89a\x01",
    b"BM" + b"\x00" * 10,
    b"\xff\xd8\xff\xda\x00\x02",  # SOS before any SOF
])
def test_unparseable_returns_none(payload):
    assert parse_image_header(payload) is None


def test_image_metadata_spark(spark):
    media = synth_image_media(spark, n=40)
    got = {r.media_id: r for r in image_metadata(media).collect()}
    assert len(got) == 40
    for i in range(40):
        r = got[i]
        # dims must round-trip through the actual binary headers
        assert (r.width, r.height) == (16 + 7 * (i % 23), 16 + 5 * (i % 31))
        assert r.format == ["png", "jpeg", "gif", "bmp"][i % 4]
        assert r.bit_depth == (24 if i % 4 == 3 else 8)


def test_image_metadata_nulls_kept(spark):
    from terrier_spark.datapipe.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(
        [(0, "image", "image/png", None, None, None,
          bytearray(make_png(4, 4))),
         (1, "image", "image/png", None, None, None, bytearray(b"junk")),
         (2, "image", "image/png", None, None, None, None)],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in image_metadata(df).collect()}
    assert rows[0].format == "png" and rows[0].width == 4
    assert rows[1].format is None and rows[1].width is None
    assert rows[2].format is None  # null payload kept, not dropped
