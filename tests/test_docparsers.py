"""Pure-stdlib binary document parsers (text/docparsers.py): fixtures are
built in-test with zipfile/zlib — real OPC packages and a real Flate PDF,
no external libraries — then routed through from_directory's default
parser table (the SimpleFileCollection surface,
org/terrier/indexing/SimpleFileCollection.java parser routing)."""

import io
import zipfile
import zlib

from terrier_spark.text.docparsers import (
    DEFAULT_BINARY_PARSERS,
    parse_docx,
    parse_pdf,
    parse_pptx,
    parse_xlsx,
)

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
A = "http://schemas.openxmlformats.org/drawingml/2006/main"
S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def _zip_bytes(parts: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in parts.items():
            zf.writestr(name, data)
    return buf.getvalue()


def make_docx() -> bytes:
    doc = f"""<?xml version="1.0"?>
<w:document xmlns:w="{W}"><w:body>
  <w:p><w:r><w:t>hello docx</w:t></w:r><w:r><w:t xml:space="preserve"> world</w:t></w:r></w:p>
  <w:p><w:r><w:t>second</w:t></w:r><w:r><w:tab/></w:r><w:r><w:t>paragraph</w:t></w:r></w:p>
</w:body></w:document>"""
    return _zip_bytes({"word/document.xml": doc,
                       "[Content_Types].xml": "<Types/>"})


def make_pptx() -> bytes:
    def slide(text):
        return (f'<?xml version="1.0"?><p:sld xmlns:a="{A}" '
                'xmlns:p="x"><p:txBody>'
                f"<a:p><a:r><a:t>{text}</a:t></a:r></a:p>"
                "</p:txBody></p:sld>")

    return _zip_bytes({
        "ppt/slides/slide1.xml": slide("first slide"),
        "ppt/slides/slide2.xml": slide("second slide"),
        "ppt/slides/slide10.xml": slide("tenth slide"),
    })


def make_xlsx() -> bytes:
    shared = (f'<?xml version="1.0"?><sst xmlns="{S}">'
              "<si><t>alpha</t></si>"
              "<si><r><t>be</t></r><r><t>ta</t></r></si></sst>")
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{S}"><sheetData>'
             '<row r="1">'
             '<c r="A1" t="s"><v>0</v></c>'
             '<c r="B1" t="s"><v>1</v></c>'
             '<c r="C1"><v>42</v></c>'
             "</row>"
             '<row r="2"><c r="A2" t="inlineStr"><is><t>inline cell</t></is>'
             "</c></row>"
             "</sheetData></worksheet>")
    return _zip_bytes({"xl/sharedStrings.xml": shared,
                       "xl/worksheets/sheet1.xml": sheet})


def make_pdf(text_ops: bytes = b"BT (Hello) Tj (, nested \\(paren\\)) Tj "
                               b"[(ad)-3(jus)2(ted)] TJ "
                               b"<48656C6C6F20686578> Tj ET",
             compress: bool = True) -> bytes:
    stream = zlib.compress(text_ops) if compress else text_ops
    return (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(stream)).encode()
            + (b" /Filter /FlateDecode" if compress else b"")
            + b" >>\nstream\n" + stream + b"\nendstream\nendobj\n"
            b"trailer\n<<>>\n%%EOF\n")


def test_docx_text():
    text = parse_docx(make_docx())
    assert text == "hello docx world\nsecond paragraph"


def test_pptx_text_slide_order():
    text = parse_pptx(make_pptx())
    # numeric part ordering: slide2 before slide10
    assert text.splitlines() == ["first slide", "second slide",
                                 "tenth slide"]


def test_xlsx_shared_inline_and_numbers():
    text = parse_xlsx(make_xlsx())
    assert text.splitlines() == ["alpha beta 42", "inline cell"]


def test_pdf_flate_literals_arrays_hex_escapes():
    text = parse_pdf(make_pdf())
    assert "Hello" in text
    assert ", nested (paren)" in text
    assert "adjusted" in text          # TJ array with kerning numbers
    assert "Hello hex" in text         # hex string operand
    # uncompressed content stream path
    assert "plain" in parse_pdf(
        make_pdf(b"BT (plain) Tj ET", compress=False)
    )


def test_pdf_garbage_is_safe():
    assert parse_pdf(b"%PDF-fake not really a pdf") == ""
    # truncated/corrupt Flate stream is skipped, not raised
    assert parse_pdf(b"stream\n\x78\x9cbroken\nendstream") == ""


def test_corrupt_file_skipped_not_fatal(spark, tmp_path):
    """One corrupt office file must not kill the crawl
    (SimpleFileCollection.java logs and skips unparseable files)."""
    from terrier_spark.index.corpus import from_directory

    d = tmp_path / "mixed"
    d.mkdir()
    (d / "good.docx").write_bytes(make_docx())
    (d / "bad.docx").write_bytes(b"PK\x03\x04 truncated-not-a-zip")
    (d / "note.txt").write_text("plain text survives")
    rows = from_directory(spark, str(d)).collect()
    got = {r["docno"].rsplit("/", 1)[-1]: r["content"] for r in rows}
    assert "bad.docx" not in got
    assert "hello docx world" in got["good.docx"]
    assert got["note.txt"] == "plain text survives"


def test_pdf_parser_total_on_arbitrary_bytes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=2048))
    def check(blob):
        out = parse_pdf(blob)          # must never raise
        assert isinstance(out, str)

    check()


def test_directory_adapter_routes_default_parsers(spark, tmp_path):
    from terrier_spark.index.corpus import from_directory

    d = tmp_path / "office"
    d.mkdir()
    (d / "a.docx").write_bytes(make_docx())
    (d / "b.pptx").write_bytes(make_pptx())
    (d / "c.xlsx").write_bytes(make_xlsx())
    (d / "d.pdf").write_bytes(make_pdf())
    rows = {r["lang"]: r["content"]
            for r in from_directory(spark, str(d)).collect()}
    assert "hello docx world" in rows["docx"]
    assert "second slide" in rows["pptx"]
    assert "inline cell" in rows["xlsx"]
    assert "Hello" in rows["pdf"]
    assert set(DEFAULT_BINARY_PARSERS) == {
        "pdf", "docx", "pptx", "xlsx", "doc", "xls", "ppt"
    }
