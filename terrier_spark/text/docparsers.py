"""Pure-stdlib binary document parsers for SimpleFileCollection routing.

The reference routes Office/PDF files to POI/PDFBox-backed Document
classes (org/terrier/indexing/SimpleFileCollection.java — PDFDocument,
MSWordDocument, MSExcelDocument, MSPowerpointDocument).  Those libraries
do not exist in this environment, but the MODERN formats need none of
them:

* .docx / .pptx / .xlsx are OPC packages — ZIP archives of XML parts
  (ECMA-376) — readable with `zipfile` + `xml.etree`.
* simple (unencrypted, Flate-or-plain) PDFs expose their page text in
  content streams whose text-showing operators (Tj / TJ / ' / ")
  carry literal or hex strings — extractable with `zlib` + a small
  tokenizer over the content stream.

The legacy OLE2 binaries (.doc/.xls/.ppt) need a compound-file +
per-format record parser; `text/olevba.py` provides pure-stdlib ones
(MS-CFB + MS-DOC piece table / MS-XLS BIFF8 / MS-PPT text atoms), and
DEFAULT_BINARY_PARSERS routes those extensions to them (the reference
uses POI for the same job).

Each parser is `bytes -> str` (the `binary_parsers` contract of
`index/corpus.py::from_directory`) and is registered as the default for
its extension in `DEFAULT_BINARY_PARSERS`.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from xml.etree import ElementTree

_WORD_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_DRAW_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_SHEET_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _zip_parts(blob: bytes, prefix: str, suffix: str = ".xml"):
    """Yield (name, bytes) for package parts under prefix, in name order
    (slide2 after slide1, sheet order preserved)."""
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        names = [
            n for n in zf.namelist()
            if n.startswith(prefix) and n.endswith(suffix)
        ]

        def order(name: str):
            m = re.search(r"(\d+)\.xml$", name)
            return (name if m is None else name[: m.start(1)],
                    int(m.group(1)) if m else 0)

        for name in sorted(names, key=order):
            yield name, zf.read(name)


def parse_docx(blob: bytes) -> str:
    """WordprocessingML main document part: every w:t run is text, w:p
    boundaries become newlines, w:tab/w:br become separators (the same
    visible-text surface POI's WordExtractor returns)."""
    parts = []
    for _, data in _zip_parts(blob, "word/document"):
        root = ElementTree.fromstring(data)
        for para in root.iter(f"{_WORD_NS}p"):
            runs = []
            for el in para.iter():
                if el.tag == f"{_WORD_NS}t":
                    runs.append(el.text or "")
                elif el.tag in (f"{_WORD_NS}tab", f"{_WORD_NS}br"):
                    runs.append(" ")
            if runs:
                parts.append("".join(runs))
    return "\n".join(parts)


def parse_pptx(blob: bytes) -> str:
    """PresentationML slides (+ notes): a:t runs inside each slide part,
    slide order preserved."""
    parts = []
    for prefix in ("ppt/slides/slide", "ppt/notesSlides/notesSlide"):
        for _, data in _zip_parts(blob, prefix):
            root = ElementTree.fromstring(data)
            texts = [el.text or "" for el in root.iter(f"{_DRAW_NS}t")]
            if texts:
                parts.append("\n".join(t for t in texts if t))
    return "\n".join(parts)


def parse_xlsx(blob: bytes) -> str:
    """SpreadsheetML: shared strings resolved per cell, inline strings and
    numeric/formula cached values included, one line per row — the cell
    text surface MSExcelDocument builds from POI's cell iterator."""
    shared: list[str] = []
    for _, data in _zip_parts(blob, "xl/sharedStrings"):
        root = ElementTree.fromstring(data)
        for si in root.iter(f"{_SHEET_NS}si"):
            shared.append(
                "".join(t.text or "" for t in si.iter(f"{_SHEET_NS}t"))
            )
    lines = []
    for _, data in _zip_parts(blob, "xl/worksheets/sheet"):
        root = ElementTree.fromstring(data)
        for row in root.iter(f"{_SHEET_NS}row"):
            cells = []
            for c in row.iter(f"{_SHEET_NS}c"):
                ctype = c.get("t", "n")
                if ctype == "s":
                    v = c.find(f"{_SHEET_NS}v")
                    idx = int(v.text) if v is not None and v.text else -1
                    if 0 <= idx < len(shared):
                        cells.append(shared[idx])
                elif ctype == "inlineStr":
                    cells.append(
                        "".join(t.text or "" for t in c.iter(f"{_SHEET_NS}t"))
                    )
                else:  # n / b / str (formula cached value)
                    v = c.find(f"{_SHEET_NS}v")
                    if v is not None and v.text:
                        cells.append(v.text)
            if cells:
                lines.append(" ".join(cells))
    return "\n".join(lines)


# ---------------------------------------------------------------- PDF ----

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", re.DOTALL)
_PDF_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _pdf_literal(buf: bytes, i: int) -> tuple[str, int]:
    """Decode a ( ... ) literal string starting at the '('; returns
    (text, index-after-closing-paren).  Handles \\-escapes, octal codes
    and balanced nested parentheses (PDF 32000-1 §7.3.4.2)."""
    out = []
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        ch = buf[i:i + 1]
        if ch == b"\\":
            nxt = buf[i + 1:i + 2]
            if nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and buf[j:j + 1].isdigit():
                    j += 1
                out.append(chr(int(buf[i + 1:j], 8)))
                i = j
                continue
            out.append(_PDF_ESCAPES.get(nxt, nxt.decode("latin-1")))
            i += 2
            continue
        if ch == b"(":
            depth += 1
        elif ch == b")":
            depth -= 1
            if not depth:
                i += 1
                break
        if depth:
            out.append(ch.decode("latin-1"))
        i += 1
    return "".join(out), i


_PDF_OP_RE = re.compile(rb"[A-Za-z'\"]+")


def _pdf_content_text(content: bytes) -> list[str]:
    """Walk one decoded content stream and collect the operands of the
    text-showing operators Tj, TJ, ' and \" (PDF 32000-1 §9.4.3).  A
    tiny stack machine: strings/arrays are pushed, an operator keeps or
    drops them.  Simple-encoding text only (no CID/Identity-H CMaps —
    those need font resources; documented limitation)."""
    out: list[str] = []
    pending: list[str] = []
    i, n = 0, len(content)
    while i < n:
        ch = content[i:i + 1]
        if ch == b"(":
            text, i = _pdf_literal(content, i)
            pending.append(text)
            continue
        if ch == b"<" and content[i + 1:i + 2] != b"<":
            j = content.find(b">", i)
            if j == -1:
                break
            hexs = re.sub(rb"\s", b"", content[i + 1:j])
            if len(hexs) % 2:
                hexs += b"0"
            try:
                raw = bytes.fromhex(hexs.decode("ascii"))
            except ValueError:
                raw = b""
            # UTF-16BE when BOM'd, else single-byte (StandardEncoding-ish)
            if raw[:2] == b"\xfe\xff":
                pending.append(raw[2:].decode("utf-16-be", "replace"))
            else:
                pending.append(raw.decode("latin-1"))
            i = j + 1
            continue
        if ch.isalpha() or ch == b"'" or ch == b'"':
            # pos-anchored match — slicing content[i:] per operator would
            # copy the stream tail and make extraction O(n^2)
            m = _PDF_OP_RE.match(content, i)
            op = m.group(0)
            i += len(op)
            if op in (b"Tj", b"TJ", b"'", b'"'):
                out.extend(pending)
                pending.clear()
            elif op in (b"Td", b"TD", b"T*", b"BT", b"ET", b"Tm"):
                # text-positioning boundaries: anything pending was a
                # non-showing operand; drop it and mark a break
                pending.clear()
                if out and not out[-1].endswith("\n"):
                    out.append("\n")
            else:
                pending.clear()
            continue
        i += 1
    return out


def parse_pdf(blob: bytes) -> str:
    """Minimal text extraction for unencrypted PDFs with plain or
    FlateDecode content streams (the overwhelming majority of
    text-bearing PDFs).  Scans every stream object, inflates when
    zlib-framed, and collects Tj/TJ/'/\" operands.  Not supported
    (returns whatever simple text exists, silently skipping the rest):
    encrypted documents, CID-keyed (Identity-H) fonts, LZW/DCT-only
    streams.  The reference gets full fidelity from PDFBox
    (org/terrier/indexing/PDFDocument.java); callers needing that pass
    their own parser via `binary_parsers`."""
    pieces: list[str] = []
    for m in _STREAM_RE.finditer(blob):
        data = m.group(1)
        if data[:1] == b"\x78":  # zlib header (FlateDecode)
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        if b"BT" not in data and b"Tj" not in data and b"TJ" not in data:
            continue
        pieces.extend(_pdf_content_text(data))
    text = "".join(pieces)
    return re.sub(r"[ \t]+", " ", text).strip()


def _legacy(name):
    # lazy import: the OLE2 parsers live in their own module
    def run(blob: bytes) -> str:
        from terrier_spark.text import olevba

        return getattr(olevba, name)(blob)

    return run


DEFAULT_BINARY_PARSERS = {
    "pdf": parse_pdf,
    "docx": parse_docx,
    "pptx": parse_pptx,
    "xlsx": parse_xlsx,
    "doc": _legacy("parse_doc"),
    "xls": _legacy("parse_xls"),
    "ppt": _legacy("parse_ppt"),
}
