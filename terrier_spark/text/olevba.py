"""Pure-stdlib best-effort text extraction for the legacy OLE2 Office
binaries (.doc/.xls/.ppt) — the formats the reference routes to POI
(org/terrier/indexing/MSWordDocument.java, MSExcelDocument.java,
MSPowerpointDocument.java).

Everything here follows the PUBLIC Microsoft format specifications:

* MS-CFB  — the compound file (OLE2) container: 512/4096-byte sectors,
  DIFAT -> FAT chains, a directory of 128-byte entries, and a
  mini-stream (64-byte mini sectors, own mini-FAT) for streams below
  the 4096-byte cutoff.
* MS-DOC  — Word 97+: the FIB in the WordDocument stream points at the
  CLX in the 0Table/1Table stream; the piece table (PlcPcd) maps
  character positions to 8-bit-CP1252 or UTF-16LE text runs.
* MS-XLS  — BIFF8 workbook stream records: SST/LABELSST shared
  strings, LABEL inline strings, NUMBER/RK numeric cells.
* MS-PPT  — the PowerPoint Document stream is a record tree whose
  TextCharsAtom (UTF-16LE) and TextBytesAtom (8-bit) leaves carry all
  slide text.

"Best-effort" means: the common non-encrypted, non-fast-saved shapes
parse; anything malformed raises (callers — `from_directory` — log and
skip the file rather than failing the crawl)."""

from __future__ import annotations

import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC
MAXREGSECT = 0xFFFFFFFA


def _chain(fat: list, start: int, limit: int) -> list:
    out, s = [], start
    while s <= MAXREGSECT and len(out) <= limit:
        out.append(s)
        if s >= len(fat):
            break
        s = fat[s]
    return out


def cfb_streams(blob: bytes) -> dict:
    """Parse an MS-CFB container -> {stream name: bytes} (all storages
    flattened; names without the path)."""
    if blob[:8] != CFB_MAGIC:
        raise ValueError("not an OLE2 compound file")
    (sector_shift, mini_shift) = struct.unpack_from("<HH", blob, 30)
    ssz, msz = 1 << sector_shift, 1 << mini_shift
    n_fat = struct.unpack_from("<I", blob, 44)[0]
    dir_start = struct.unpack_from("<I", blob, 48)[0]
    mini_cutoff = struct.unpack_from("<I", blob, 56)[0]
    minifat_start = struct.unpack_from("<I", blob, 60)[0]
    n_minifat = struct.unpack_from("<I", blob, 64)[0]
    difat_start = struct.unpack_from("<I", blob, 68)[0]
    n_difat = struct.unpack_from("<I", blob, 72)[0]

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        return blob[off:off + ssz]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", blob, 76))
    s = difat_start
    for _ in range(n_difat):
        if s > MAXREGSECT:
            break
        raw = sector(s)
        entries = struct.unpack(f"<{ssz // 4}I", raw)
        difat.extend(entries[:-1])
        s = entries[-1]
    fat: list = []
    for fs in difat[:n_fat]:
        if fs > MAXREGSECT:
            continue
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(fs)))

    max_sectors = max((len(blob) - 512) // ssz + 1, 1)

    def read_chain(start: int, size: int) -> bytes:
        return b"".join(sector(s) for s in _chain(fat, start, max_sectors))[
            :size
        ]

    # directory entries (128 bytes each)
    dir_raw = read_chain(dir_start, max_sectors * ssz)
    entries = []
    for off in range(0, len(dir_raw) - 127, 128):
        name_len = struct.unpack_from("<H", dir_raw, off + 64)[0]
        obj_type = dir_raw[off + 66]
        if obj_type == 0 or name_len < 2:
            continue
        name = dir_raw[off:off + name_len - 2].decode("utf-16-le",
                                                      "replace")
        start = struct.unpack_from("<I", dir_raw, off + 116)[0]
        size = struct.unpack_from("<Q", dir_raw, off + 120)[0]
        entries.append((name, obj_type, start, size))

    # mini stream lives in the ROOT entry's regular chain
    root = next((e for e in entries if e[1] == 5), None)
    mini_data = read_chain(root[2], root[3]) if root else b""
    minifat: list = []
    for s in _chain(fat, minifat_start, n_minifat + max_sectors):
        minifat.extend(struct.unpack(f"<{ssz // 4}I", sector(s)))

    def read_mini(start: int, size: int) -> bytes:
        out = []
        for s in _chain(minifat, start, len(minifat) + 1):
            out.append(mini_data[s * msz:(s + 1) * msz])
        return b"".join(out)[:size]

    streams = {}
    for name, obj_type, start, size in entries:
        if obj_type != 2:  # stream
            continue
        if size < mini_cutoff:
            streams[name] = read_mini(start, size)
        else:
            streams[name] = read_chain(start, size)
    return streams


# ---------------------------------------------------------------- .doc ----

def parse_doc(blob: bytes) -> str:
    """MS-DOC: FIB -> CLX in the table stream -> piece table -> text
    runs (fCompressed ? cp1252 at fc/2 : utf-16-le at fc)."""
    streams = cfb_streams(blob)
    word = streams.get("WordDocument")
    if word is None or len(word) < 1024:
        raise ValueError("no WordDocument stream")
    if struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        raise ValueError("not a Word97+ FIB")
    flags = struct.unpack_from("<H", word, 10)[0]
    table = streams.get("1Table" if flags & 0x0200 else "0Table")
    fc_clx, lcb_clx = struct.unpack_from("<II", word, 0x01A2)
    if table is None or lcb_clx == 0:
        raise ValueError("no table stream / CLX")
    clx = table[fc_clx:fc_clx + lcb_clx]
    # CLX = (Prc)* Pcdt ; Prc: 0x01 + cbGrpprl(u16) + data; Pcdt: 0x02 +
    # lcb(u32) + PlcPcd
    i = 0
    while i < len(clx) and clx[i] == 0x01:
        cb = struct.unpack_from("<H", clx, i + 1)[0]
        i += 3 + cb
    if i >= len(clx) or clx[i] != 0x02:
        raise ValueError("no Pcdt in CLX")
    lcb = struct.unpack_from("<I", clx, i + 1)[0]
    plc = clx[i + 5:i + 5 + lcb]
    # PlcPcd: n+1 CPs (u32) then n PCDs (8 bytes); n from lcb = 4(n+1)+8n
    n = (len(plc) - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    pieces = []
    for j in range(n):
        pcd = plc[4 * (n + 1) + 8 * j:4 * (n + 1) + 8 * j + 8]
        fc_raw = struct.unpack_from("<I", pcd, 2)[0]
        n_chars = cps[j + 1] - cps[j]
        if fc_raw & 0x40000000:  # fCompressed: 8-bit text at fc/2
            fc = (fc_raw & 0x3FFFFFFF) // 2
            pieces.append(
                word[fc:fc + n_chars].decode("cp1252", "replace")
            )
        else:
            fc = fc_raw & 0x3FFFFFFF
            pieces.append(
                word[fc:fc + 2 * n_chars].decode("utf-16-le", "replace")
            )
    text = "".join(pieces)
    # Word control characters: CR becomes newline, cell/row marks and
    # field chars become spaces
    out = []
    for ch in text:
        if ch == "\r":
            out.append("\n")
        elif ch in "\x07\x0b\x0c\x0d\x13\x14\x15\x01\x02\x05\x08":
            out.append(" ")
        else:
            out.append(ch)
    return "".join(out).strip()


# ---------------------------------------------------------------- .xls ----

def _xl_unicode_string(data: bytes, off: int) -> tuple:
    """XLUnicodeRichExtendedString -> (text, next_offset).  Rich-text
    runs and extended data are skipped per spec."""
    cch = struct.unpack_from("<H", data, off)[0]
    grbit = data[off + 2]
    off += 3
    c_run = 0
    cb_ext = 0
    if grbit & 0x08:  # fRichSt
        c_run = struct.unpack_from("<H", data, off)[0]
        off += 2
    if grbit & 0x04:  # fExtSt
        cb_ext = struct.unpack_from("<I", data, off)[0]
        off += 4
    if grbit & 0x01:  # fHighByte -> utf-16
        text = data[off:off + 2 * cch].decode("utf-16-le", "replace")
        off += 2 * cch
    else:
        text = data[off:off + cch].decode("latin-1", "replace")
        off += cch
    off += 4 * c_run + cb_ext
    return text, off


def _rk_value(rk: int) -> float:
    if rk & 0x02:
        # fInt: the top 30 bits are a SIGNED integer — sign-extend, or a
        # negative cell (e.g. -1 = 0xFFFFFFFE|flags) decodes as ~10^9
        val = rk >> 2
        if val & 0x20000000:
            val -= 0x40000000
        return val / 100.0 if rk & 0x01 else float(val)
    # top 30 bits are the high bits of an IEEE double
    val = struct.unpack("<d", struct.pack("<Q", (rk & ~0x03) << 32))[0]
    if rk & 0x01:
        val /= 100.0
    return val


def parse_xls(blob: bytes) -> str:
    """BIFF8 workbook: SST + LABELSST shared strings, LABEL inline
    strings, NUMBER/RK numerics; one token per cell in record order."""
    streams = cfb_streams(blob)
    book = streams.get("Workbook") or streams.get("Book")
    if book is None:
        raise ValueError("no Workbook stream")
    sst: list = []
    cells: list = []
    i = 0
    while i + 4 <= len(book):
        rtype, rlen = struct.unpack_from("<HH", book, i)
        data = book[i + 4:i + 4 + rlen]
        if rtype == 0x00FC:  # SST
            cstot = struct.unpack_from("<I", data, 4)[0]
            off = 8
            try:
                while off < len(data) and len(sst) < cstot:
                    s, off = _xl_unicode_string(data, off)
                    sst.append(s)
            except (struct.error, IndexError):
                pass  # strings continued into CONTINUE records: partial
        elif rtype == 0x00FD and rlen >= 10:  # LABELSST
            isst = struct.unpack_from("<I", data, 6)[0]
            if isst < len(sst):
                cells.append(sst[isst])
        elif rtype == 0x0204 and rlen >= 8:  # LABEL (inline)
            try:
                s, _ = _xl_unicode_string(data, 6)
                cells.append(s)
            except (struct.error, IndexError):
                pass
        elif rtype == 0x0203 and rlen >= 14:  # NUMBER
            cells.append(_fmt_num(struct.unpack_from("<d", data, 6)[0]))
        elif rtype == 0x027E and rlen >= 10:  # RK
            cells.append(
                _fmt_num(_rk_value(struct.unpack_from("<I", data, 6)[0]))
            )
        i += 4 + rlen
    return " ".join(c for c in cells if c)


def _fmt_num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(v)


# ---------------------------------------------------------------- .ppt ----

def parse_ppt(blob: bytes) -> str:
    """MS-PPT: walk the PowerPoint Document record tree; TextCharsAtom
    (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8, 8-bit) leaves carry
    the slide text."""
    streams = cfb_streams(blob)
    doc = streams.get("PowerPoint Document")
    if doc is None:
        raise ValueError("no PowerPoint Document stream")
    texts: list = []

    def walk(data: bytes, depth: int = 0) -> None:
        i = 0
        while i + 8 <= len(data) and depth < 16:
            ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, i)
            body = data[i + 8:i + 8 + rlen]
            if (ver_inst & 0x0F) == 0x0F:  # container record
                walk(body, depth + 1)
            elif rtype == 0x0FA0:  # TextCharsAtom
                texts.append(body.decode("utf-16-le", "replace"))
            elif rtype == 0x0FA8:  # TextBytesAtom
                texts.append(body.decode("cp1252", "replace"))
            i += 8 + rlen
    walk(doc)
    return "\n".join(
        t.replace("\r", "\n").strip() for t in texts if t.strip()
    )
