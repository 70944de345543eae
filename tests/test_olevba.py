"""Legacy OLE2 parsers (text/olevba.py): a minimal spec-compliant MS-CFB
writer builds real compound files in-test (regular FAT chains AND the
mini-stream path), then .doc/.xls/.ppt fixtures exercise the extractors
(MSWordDocument / MSExcelDocument / MSPowerpointDocument surfaces)."""

import struct

from terrier_spark.text.olevba import (
    cfb_streams,
    parse_doc,
    parse_ppt,
    parse_xls,
)

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
NOSTREAM = 0xFFFFFFFF


def make_cfb(streams: dict) -> bytes:
    """Write {name: bytes} into a single-FAT-sector CFB container
    (512-byte sectors, 64-byte mini sectors, 4096 mini cutoff)."""
    ssz, msz, cutoff = 512, 64, 4096

    def pad(b: bytes, n: int) -> bytes:
        return b + b"\x00" * (-len(b) % n)

    mini_items = {n: d for n, d in streams.items() if len(d) < cutoff}
    big_items = {n: d for n, d in streams.items() if len(d) >= cutoff}

    # mini stream layout
    mini_data = b""
    mini_start = {}
    minifat = []
    for name, data in mini_items.items():
        first = len(mini_data) // msz
        mini_start[name] = first
        mini_data += pad(data, msz)
        n_mini = (len(data) + msz - 1) // msz
        minifat.extend(
            list(range(first + 1, first + n_mini)) + [ENDOFCHAIN]
        )

    # sector plan: [0]=FAT, [1]=directory, [2]=miniFAT,
    # [3..]=ministream sectors, then big streams
    sectors: list = []

    def alloc(data: bytes) -> int:
        first = len(sectors) + 3  # after FAT/dir/miniFAT
        for off in range(0, len(data), ssz):
            sectors.append(pad(data[off:off + ssz], ssz))
        return first

    ministream_first = alloc(pad(mini_data, ssz)) if mini_data else ENDOFCHAIN
    big_start = {}
    for name, data in big_items.items():
        big_start[name] = alloc(data)

    # directory: root + one entry per stream
    def dirent(name: str, obj_type: int, start: int, size: int) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0:len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw))
        e[66] = obj_type
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, NOSTREAM, NOSTREAM,
                         1 if obj_type == 5 else NOSTREAM)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    dents = [dirent("Root Entry", 5, ministream_first, len(mini_data))]
    for name, data in streams.items():
        start = mini_start.get(name, big_start.get(name))
        dents.append(dirent(name, 2, start, len(data)))
    dir_data = pad(b"".join(dents), ssz)
    assert len(dir_data) <= ssz, "test writer supports <= 3 streams"

    total_sectors = 3 + len(sectors)
    fat = [FATSECT, ENDOFCHAIN, ENDOFCHAIN]  # FAT, dir, miniFAT
    # ministream chain then big chains, in allocation order
    chains = []
    if mini_data:
        chains.append((ministream_first,
                       (len(pad(mini_data, ssz)) + ssz - 1) // ssz))
    for name in big_items:
        chains.append((big_start[name],
                       (len(big_items[name]) + ssz - 1) // ssz))
    fat.extend([FREESECT] * (total_sectors - 3))
    for first, count in chains:
        for i in range(count - 1):
            fat[first + i] = first + i + 1
        fat[first + count - 1] = ENDOFCHAIN
    fat_data = pad(
        b"".join(struct.pack("<I", x) for x in fat), ssz
    )[:ssz].ljust(ssz, b"\xff")
    minifat_data = pad(
        b"".join(struct.pack("<I", x) for x in minifat), ssz
    )[:ssz].ljust(ssz, b"\xff") if minifat else b"\xff" * ssz

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 26, 0x003E)   # minor version
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<HH", header, 30, 9, 6)    # 512B / 64B shifts
    struct.pack_into("<I", header, 44, 1)        # one FAT sector
    struct.pack_into("<I", header, 48, 1)        # directory start
    struct.pack_into("<I", header, 56, cutoff)
    struct.pack_into("<I", header, 60, 2 if minifat else ENDOFCHAIN)
    struct.pack_into("<I", header, 64, 1 if minifat else 0)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, 0)        # DIFAT[0] = FAT sector 0
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, FREESECT)

    body = fat_data + dir_data + minifat_data + b"".join(sectors)
    return bytes(header) + body


def test_cfb_roundtrip_mini_and_regular():
    small = b"tiny stream content"
    large = bytes(range(256)) * 20  # 5120 B >= cutoff -> regular chain
    got = cfb_streams(make_cfb({"Small": small, "Large": large}))
    assert got["Small"] == small
    assert got["Large"] == large


def make_doc(pieces) -> bytes:
    """pieces: list of (text, compressed) -> a Word97 .doc container."""
    word = bytearray(2048)
    struct.pack_into("<H", word, 0, 0xA5EC)
    struct.pack_into("<H", word, 10, 0)          # 0Table
    text_off = 1024
    cps = [0]
    pcds = []
    for text, compressed in pieces:
        cps.append(cps[-1] + len(text))
        if compressed:
            raw = text.encode("cp1252")
            fc_raw = (text_off * 2) | 0x40000000
        else:
            raw = text.encode("utf-16-le")
            fc_raw = text_off
        word[text_off:text_off + len(raw)] = raw
        text_off += len(raw)
        pcds.append(b"\x00\x00" + struct.pack("<I", fc_raw) + b"\x00\x00")
    n = len(pieces)
    plc = b"".join(struct.pack("<I", c) for c in cps) + b"".join(pcds)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<II", word, 0x01A2, 0, len(clx))  # CLX at table[0]
    return make_cfb({"WordDocument": bytes(word), "0Table": clx})


def test_parse_doc_compressed_and_unicode_pieces():
    blob = make_doc([("Hello legacy Word\r", True), ("unicode piece", False)])
    text = parse_doc(blob)
    assert "Hello legacy Word" in text
    assert "unicode piece" in text
    assert "\r" not in text


def _sst_string(s: str) -> bytes:
    return struct.pack("<HB", len(s), 0) + s.encode("latin-1")


def make_xls() -> bytes:
    recs = []
    sst_body = struct.pack("<II", 2, 2) + _sst_string("alpha") + \
        _sst_string("beta")
    recs.append(struct.pack("<HH", 0x00FC, len(sst_body)) + sst_body)
    for isst in (0, 1):
        body = struct.pack("<HHHI", 0, 0, 0, isst)
        recs.append(struct.pack("<HH", 0x00FD, len(body)) + body)
    num_body = struct.pack("<HHH", 0, 2, 0) + struct.pack("<d", 2.5)
    recs.append(struct.pack("<HH", 0x0203, len(num_body)) + num_body)
    rk_body = struct.pack("<HHH", 1, 0, 0) + struct.pack(
        "<I", (42 << 2) | 0x02
    )
    recs.append(struct.pack("<HH", 0x027E, len(rk_body)) + rk_body)
    return make_cfb({"Workbook": b"".join(recs)})


def test_parse_xls_sst_number_rk():
    text = parse_xls(make_xls())
    assert text.split() == ["alpha", "beta", "2.5", "42"]


def make_ppt() -> bytes:
    chars = "slide title".encode("utf-16-le")
    bytes_ = b"notes text"
    atoms = (
        struct.pack("<HHI", 0, 0x0FA0, len(chars)) + chars
        + struct.pack("<HHI", 0, 0x0FA8, len(bytes_)) + bytes_
    )
    container = struct.pack("<HHI", 0x000F, 0x03E8, len(atoms)) + atoms
    return make_cfb({"PowerPoint Document": container})


def test_parse_ppt_text_atoms():
    text = parse_ppt(make_ppt())
    assert "slide title" in text
    assert "notes text" in text


def test_garbage_raises_cleanly():
    import pytest

    for fn in (parse_doc, parse_xls, parse_ppt):
        with pytest.raises(Exception):
            fn(b"\xd0\xcf\x11\xe0 not really")
        with pytest.raises(Exception):
            fn(b"plain text")


def test_directory_crawl_routes_legacy_formats(spark, tmp_path):
    from terrier_spark.index.corpus import from_directory

    d = tmp_path / "legacy"
    d.mkdir()
    (d / "a.doc").write_bytes(make_doc([("word text here", True)]))
    (d / "b.xls").write_bytes(make_xls())
    (d / "c.ppt").write_bytes(make_ppt())
    (d / "broken.doc").write_bytes(b"\xd0\xcf\x11\xe0 truncated")
    rows = {r["lang"]: r["content"]
            for r in from_directory(spark, str(d)).collect()}
    assert "word text here" in rows["doc"]
    assert "alpha beta" in rows["xls"]
    assert "slide title" in rows["ppt"]
    assert len(rows) == 3  # broken.doc skipped, job alive


def test_rk_value_sign_extension():
    from terrier_spark.text.olevba import _rk_value

    # fInt: 30-bit SIGNED integer in the top 30 bits
    assert _rk_value((42 << 2) | 0x02) == 42.0
    # -1 encodes as all-ones in the top 30 bits
    assert _rk_value((0xFFFFFFFF << 2 & 0xFFFFFFFF) | 0x02) == -1.0
    assert _rk_value(((-12345 & 0x3FFFFFFF) << 2) | 0x02) == -12345.0
    # fInt + div100
    assert _rk_value(((-250 & 0x3FFFFFFF) << 2) | 0x03) == -2.5
    # IEEE-double branch (unchanged): 2.5 -> high 30 bits of the double
    import struct as _s

    bits = _s.unpack("<Q", _s.pack("<d", -2.5))[0] >> 32
    assert _rk_value(bits & ~0x03) == -2.5
