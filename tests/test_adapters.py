"""Collection adapters: TREC, TREC-Web (DOCHDR), WARC, TwitterJSON, XML
fixtures -> canonical corpus -> index builds end to end."""

import pytest

from terrier_spark.config import IndexConfig, QueryConfig
from terrier_spark.index.builder import build_index
from terrier_spark.index.corpus import (
    from_trec_files,
    from_trec_web_files,
    from_twitter_json,
    from_warc_files,
    from_xml_files,
)
from terrier_spark.query.search import search

TREC_FILE = """
<DOC>
<DOCNO> WSJ870324-0001 </DOCNO>
<HL> title words here </HL>
<TEXT>
alpha beta gamma delta
</TEXT>
</DOC>
<DOC>
<DOCNO>WSJ870324-0002</DOCNO>
<TEXT>epsilon zeta</TEXT>
</DOC>
"""

TREC_WEB_FILE = """
<DOC>
<DOCNO>WT01-B01-1</DOCNO>
<DOCHDR>
http://www.example.org:80/page.htm 192.0.2.1 19970121041510 text/html 2407
HTTP/1.0 200 OK
Content-type: text/html
</DOCHDR>
<html><body>web alpha content words</body></html>
</DOC>
"""

WARC_FILE = """WARC/1.0
WARC-Type: warcinfo
WARC-Record-ID: <urn:uuid:info>

ignored preamble

WARC/1.0
WARC-Type: response
WARC-Record-ID: <urn:uuid:rec1>
WARC-TREC-ID: clueweb09-0000tw-00-00001
WARC-Target-URI: http://a.example.com/x
Content-Length: 120

HTTP/1.1 200 OK
Content-Type: text/html

<html>warc document one body</html>

WARC/1.0
WARC-Type: request
WARC-Record-ID: <urn:uuid:req>

GET /x HTTP/1.1

WARC/1.0
WARC-Type: response
WARC-Record-ID: <urn:uuid:rec2>
WARC-Target-URI: https://b.example.com/y

plain second body text
"""

TWEETS = "\n".join([
    '{"id_str": "101", "text": "first tweet words", '
    '"lang": "en", "user": {"screen_name": "alice"}}',
    '{"id_str": "102", "text": "segunda publicacion", '
    '"lang": "es", "user": {"screen_name": "bob"}}',
])

XML_FILE = """<collection>
<doc><docno>x1</docno><title>tee one</title><body>xml body alpha</body></doc>
<doc><docno>x2</docno><body>xml body beta</body></doc>
</collection>
"""


def test_trec_adapter(spark, tmp_path):
    p = tmp_path / "f1.trec"
    p.write_text(TREC_FILE)
    rows = {
        r["docno"]: r
        for r in from_trec_files(spark, str(p)).collect()
    }
    assert set(rows) == {"WSJ870324-0001", "WSJ870324-0002"}
    c1 = rows["WSJ870324-0001"]["content"]
    assert "alpha" in c1 and "title" in c1
    assert "<" not in c1 and "DOCNO" not in c1
    assert rows["WSJ870324-0002"]["content"].split() == ["epsilon", "zeta"]


def test_trec_web_adapter(spark, tmp_path):
    p = tmp_path / "wt.trec"
    p.write_text(TREC_WEB_FILE)
    rows = from_trec_web_files(spark, str(p)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["docno"] == "WT01-B01-1"
    assert r["path"] == "http://www.example.org:80/page.htm"
    assert r["repo"] == "www.example.org:80"
    # DOCHDR content (HTTP headers) must NOT leak into the body
    assert "Content" not in r["content"] and "HTTP" not in r["content"]
    assert "web alpha content words" in r["content"]


def test_warc_adapter(spark, tmp_path):
    p = tmp_path / "f.warc"
    p.write_text(WARC_FILE)
    rows = {r["docno"]: r for r in from_warc_files(spark, str(p)).collect()}
    # only the two response records
    assert set(rows) == {"clueweb09-0000tw-00-00001", "urn:uuid:rec2"}
    r1 = rows["clueweb09-0000tw-00-00001"]
    assert r1["path"] == "http://a.example.com/x"
    assert r1["repo"] == "a.example.com"
    assert "warc document one body" in r1["content"]
    assert "HTTP" not in r1["content"]  # HTTP headers stripped
    assert "plain second body text" in rows["urn:uuid:rec2"]["content"]


def test_twitter_json_adapter(spark, tmp_path):
    p = tmp_path / "tweets.json"
    p.write_text(TWEETS)
    rows = {r["docno"]: r for r in from_twitter_json(spark, str(p)).collect()}
    assert set(rows) == {"101", "102"}
    assert rows["101"]["content"] == "first tweet words"
    assert rows["101"]["repo"] == "alice"
    assert rows["102"]["lang"] == "es"


def test_xml_adapter(spark, tmp_path):
    p = tmp_path / "c.xml"
    p.write_text(XML_FILE)
    rows = {r["docno"]: r for r in from_xml_files(spark, str(p)).collect()}
    assert set(rows) == {"x1", "x2"}
    assert "tee one" in rows["x1"]["content"]
    assert "xml body alpha" in rows["x1"]["content"]
    assert rows["x2"]["content"] == "xml body beta"


def test_medline_xml_variant(spark, tmp_path):
    """SimpleMedlineXMLCollection (org/terrier/indexing/
    SimpleMedlineXMLCollection.java) is the same XML machinery with
    Medline tag names — covered by from_xml_files' configurable tags."""
    p = tmp_path / "medline.xml"
    p.write_text(
        "<MedlineCitationSet>"
        "<MedlineCitation><PMID>12345</PMID>"
        "<ArticleTitle>aspirin trial</ArticleTitle>"
        "<AbstractText>randomized controlled study</AbstractText>"
        "</MedlineCitation>"
        "<MedlineCitation><PMID>67890</PMID>"
        "<AbstractText>second abstract</AbstractText>"
        "</MedlineCitation>"
        "</MedlineCitationSet>"
    )
    rows = {
        r["docno"]: r
        for r in from_xml_files(
            spark, str(p), doc_tag="MedlineCitation", docno_tag="PMID"
        ).collect()
    }
    assert set(rows) == {"12345", "67890"}
    assert "aspirin trial" in rows["12345"]["content"]
    assert "randomized controlled study" in rows["12345"]["content"]
    assert rows["67890"]["content"] == "second abstract"


def test_adapter_corpus_indexes_end_to_end(spark, tmp_path):
    p = tmp_path / "f1.trec"
    p.write_text(TREC_FILE)
    corpus = from_trec_files(spark, str(p))
    store = build_index(spark, corpus, str(tmp_path / "idx"),
                        IndexConfig(), bucket_span=64)
    assert store.stats["num_docs"] == 2
    res = search(spark, store, [("q", "alpha")],
                 QueryConfig(k=5, ignore_low_idf=False)).collect()
    assert len(res) == 1
    meta = {r["docno"] for r in store.meta(spark).collect()}
    assert meta == {"WSJ870324-0001", "WSJ870324-0002"}


def test_directory_adapter(spark, tmp_path):
    from terrier_spark.index.corpus import from_directory

    d = tmp_path / "crawl"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_text("plain alpha words")
    (d / "b.html").write_text("<html><body>tagged <b>beta</b> words</body>")
    (d / "sub" / "c.py").write_text("def gamma(): pass")
    rows = {r["docno"].rsplit("/", 1)[-1]: r
            for r in from_directory(spark, str(d)).collect()}
    assert set(rows) == {"a.txt", "b.html", "c.py"}
    assert rows["a.txt"]["content"] == "plain alpha words"
    assert "tagged" in rows["b.html"]["content"]
    assert "<b>" not in rows["b.html"]["content"]       # tags stripped
    assert rows["c.py"]["lang"] == "py"


def test_directory_adapter_binary_stub_and_custom_parser(spark, tmp_path):
    import pytest

    from terrier_spark.index.corpus import from_directory

    d = tmp_path / "crawl2"
    d.mkdir()
    # a corrupt OLE2 file is skipped by the default parser chain...
    (d / "doc.doc").write_bytes(b"\xd0\xcf\x11\xe0fake")
    assert from_directory(spark, str(d)).collect() == []
    # ...and a caller-supplied parser overrides the default
    rows = from_directory(
        spark, str(d),
        binary_parsers={"doc": lambda b: f"parsed {len(b)} bytes"},
    ).collect()
    assert rows[0]["content"] == "parsed 8 bytes"


def test_directory_adapter_glob_prunes_scan(spark, tmp_path):
    from terrier_spark.index.corpus import from_directory

    d = tmp_path / "crawl3"
    d.mkdir()
    (d / "keep.txt").write_text("kept")
    (d / "skip.log").write_text("skipped")
    rows = from_directory(spark, str(d), glob="*.txt").collect()
    assert len(rows) == 1 and rows[0]["content"] == "kept"
