"""Corpus adapters: bring any document table into the canonical corpus
shape the engine indexes.

Canonical corpus schema (BASELINE.json input_hint — the analog of the
reference's Collection/Document stream, org/terrier/indexing/Document.java:37-75):

    repo:string, path:string, commit:string, lang:string, content:string

plus a `docno` external identifier (the reference's primary metadata key,
org/terrier/indexing/TRECCollection.java DOCNO handling).  When the source
has no natural docno we derive `repo || '/' || path @ commit`.
"""

from __future__ import annotations

import hashlib
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ("docno", "repo", "path", "commit", "lang", "content")


def from_source_code_table(df: DataFrame) -> DataFrame:
    """Canonicalize an input_hint-shaped table
    (repo, path, commit, lang, content)."""
    return df.select(
        F.concat_ws("@", F.concat_ws("/", "repo", "path"), "commit").alias("docno"),
        "repo", "path", "commit", "lang", "content",
    )


def from_documents_table(df: DataFrame) -> DataFrame:
    """Canonicalize the driver testdata `documents` table
    (doc_id, text, lang, source, n_chars): docno = doc_id."""
    return df.select(
        F.col("doc_id").cast("string").alias("docno"),
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("HEAD").alias("commit"),
        "lang",
        F.col("text").alias("content"),
    )


def load_documents_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return from_documents_table(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


# ---------------------------------------------------------------------------
# Deterministic synthetic source-code corpus (FIXTURES.md §1): used by tests
# that need the exact input_hint shape.  Seeded, self-contained.
# ---------------------------------------------------------------------------
# Non-TREC / tagged-corpus adapters (SURVEY.md §2.1 rows 1-5).  Each maps a
# collection format onto the canonical corpus shape; parallelism unit = one
# file per task (the reference's Collection implementations stream one file
# at a time too — org/terrier/indexing/TRECCollection.java:73-398).
# ---------------------------------------------------------------------------

import re as _re

_DOC_RE = _re.compile(r"<DOC>(.*?)</DOC>", _re.DOTALL | _re.IGNORECASE)
_DOCNO_RE = _re.compile(r"<DOCNO>\s*(.*?)\s*</DOCNO>",
                        _re.DOTALL | _re.IGNORECASE)
_DOCHDR_RE = _re.compile(r"<DOCHDR>\s*(.*?)\s*</DOCHDR>",
                         _re.DOTALL | _re.IGNORECASE)
_TAG_RE = _re.compile(r"<[^>]+>")


def _wholetext(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.text(path, wholetext=True)
        .withColumn("__file", F.input_file_name())
    )


def from_trec_files(spark: SparkSession, path: str,
                    strip_tags: bool = True) -> DataFrame:
    """TRECCollection (org/terrier/indexing/TRECCollection.java:73-398):
    <DOC><DOCNO>id</DOCNO> body </DOC> tagged files -> canonical corpus.
    docno = DOCNO text; content = everything inside DOC minus the DOCNO
    (and minus markup when strip_tags)."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for raw, fname in zip(pdf["value"], pdf["__file"]):
                for m in _DOC_RE.finditer(raw or ""):
                    body = m.group(1)
                    dm = _DOCNO_RE.search(body)
                    docno = dm.group(1) if dm else ""
                    body = _DOCNO_RE.sub(" ", body)
                    body = _DOCHDR_RE.sub(" ", body)
                    if strip_tags:
                        body = _TAG_RE.sub(" ", body)
                    rows.append((docno, fname, docno, "HEAD", "",
                                 body.strip()))
            if rows:
                yield pd.DataFrame(rows, columns=list(CORPUS_COLUMNS))

    return _wholetext(spark, path).mapInPandas(
        parse,
        schema="docno string, repo string, path string, commit string, "
               "lang string, content string",
    )


def from_trec_web_files(spark: SparkSession, path: str) -> DataFrame:
    """TRECWebCollection (org/terrier/indexing/TRECWebCollection.java):
    TREC-tagged web corpora whose DOC carries a DOCHDR block (URL on the
    first line, then HTTP headers).  url -> path, host -> repo; the
    DOCHDR is excluded from the content, markup stripped."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for raw, fname in zip(pdf["value"], pdf["__file"]):
                for m in _DOC_RE.finditer(raw or ""):
                    body = m.group(1)
                    dm = _DOCNO_RE.search(body)
                    docno = dm.group(1) if dm else ""
                    url = ""
                    hm = _DOCHDR_RE.search(body)
                    if hm:
                        first = hm.group(1).splitlines()[0].strip()
                        url = first.split()[0] if first else ""
                    host = ""
                    if "://" in url:
                        host = url.split("://", 1)[1].split("/", 1)[0]
                    body = _DOCNO_RE.sub(" ", body)
                    body = _DOCHDR_RE.sub(" ", body)
                    body = _TAG_RE.sub(" ", body)
                    rows.append((docno, host, url or docno, "HEAD", "",
                                 body.strip()))
            if rows:
                yield pd.DataFrame(rows, columns=list(CORPUS_COLUMNS))

    return _wholetext(spark, path).mapInPandas(
        parse,
        schema="docno string, repo string, path string, commit string, "
               "lang string, content string",
    )


def from_warc_files(spark: SparkSession, path: str) -> DataFrame:
    """WARC10Collection-shaped adapter (org/terrier/indexing/
    WARC10Collection.java): WARC/1.0 (or 0.18) record streams.  Only
    `response` records become documents; docno = WARC-TREC-ID else
    WARC-Record-ID; path = WARC-Target-URI; the HTTP header block at the
    start of the payload is dropped; markup stripped."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for raw, fname in zip(pdf["value"], pdf["__file"]):
                for rec in _re.split(r"(?m)^WARC/\d[\d.]*\s*$", raw or ""):
                    if not rec.strip():
                        continue
                    head, _, payload = rec.partition("\n\n")
                    headers = {}
                    for line in head.splitlines():
                        k, _, v = line.partition(":")
                        if v:
                            headers[k.strip().lower()] = v.strip()
                    if headers.get("warc-type") != "response":
                        continue
                    docno = headers.get(
                        "warc-trec-id", headers.get("warc-record-id", "")
                    ).strip("<>")
                    url = headers.get("warc-target-uri", "")
                    # drop the HTTP response header block if present
                    if payload.lstrip().startswith("HTTP/"):
                        _, _, payload = payload.partition("\n\n")
                    host = ""
                    if "://" in url:
                        host = url.split("://", 1)[1].split("/", 1)[0]
                    rows.append((docno, host, url or docno, "HEAD", "",
                                 _TAG_RE.sub(" ", payload).strip()))
            if rows:
                yield pd.DataFrame(rows, columns=list(CORPUS_COLUMNS))

    return _wholetext(spark, path).mapInPandas(
        parse,
        schema="docno string, repo string, path string, commit string, "
               "lang string, content string",
    )


def from_twitter_json(spark: SparkSession, path: str) -> DataFrame:
    """TwitterJSONCollection (org/terrier/indexing/
    TwitterJSONCollection.java): one JSON tweet per line.  docno =
    id_str (else id); content = text; user.screen_name -> repo."""
    df = spark.read.json(path)
    cols = set(df.columns)
    docno = (
        F.col("id_str") if "id_str" in cols else F.col("id").cast("string")
    )
    repo = (
        F.col("user.screen_name")
        if "user" in cols else F.lit("")
    )
    lang = F.col("lang") if "lang" in cols else F.lit("")
    return df.select(
        docno.alias("docno"),
        repo.alias("repo"),
        docno.alias("path"),
        F.lit("HEAD").alias("commit"),
        lang.alias("lang"),
        F.col("text").alias("content"),
    )


def from_xml_files(spark: SparkSession, path: str, doc_tag: str = "doc",
                   docno_tag: str = "docno") -> DataFrame:
    """SimpleXMLCollection (org/terrier/indexing/SimpleXMLCollection.java):
    XML corpora; each <doc_tag> element is a document, <docno_tag> child
    its identifier, content = all remaining element text."""

    def parse(batches):
        import xml.etree.ElementTree as ET

        import pandas as pd

        for pdf in batches:
            rows = []
            for raw, fname in zip(pdf["value"], pdf["__file"]):
                if not raw or not raw.strip():
                    continue
                root = ET.fromstring(raw)
                docs = (
                    [root] if root.tag == doc_tag
                    else root.findall(f".//{doc_tag}")
                )
                for el in docs:
                    dn = el.find(docno_tag)
                    docno = (dn.text or "").strip() if dn is not None else ""
                    parts = []
                    for sub in el.iter():
                        if sub.tag == docno_tag:
                            continue
                        if sub.text and sub.text.strip():
                            parts.append(sub.text.strip())
                    rows.append((docno, fname, docno, "HEAD", "",
                                 " ".join(parts)))
            if rows:
                yield pd.DataFrame(rows, columns=list(CORPUS_COLUMNS))

    return _wholetext(spark, path).mapInPandas(
        parse,
        schema="docno string, repo string, path string, commit string, "
               "lang string, content string",
    )


# extensions the reference's SimpleFileCollection routes to binary
# parsers (PDFDocument / MS*Document, indexing/SimpleFileCollection.java)
_BINARY_EXTS = ("pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx")


def from_directory(spark: SparkSession, path: str,
                   glob: str = "*",
                   recursive: bool = True,
                   binary_parsers: dict | None = None) -> DataFrame:
    """SimpleFileCollection (org/terrier/indexing/SimpleFileCollection.java):
    crawl a directory and make one document per file, choosing the
    parser by extension — FileDocument for plain text,
    TaggedDocument-style tag stripping for HTML/XHTML, and the binary
    Office/PDF parsers.  docno = file path.

    Spark-first: one `binaryFile` scan (distributed, pruned by
    pathGlobFilter) and an Arrow-batched decode kernel.  Every binary
    format parses out of the box with the pure-stdlib parsers in
    `text/docparsers.py`: pdf/docx/pptx/xlsx exactly (OPC-ZIP XML parts
    and Flate PDF content streams) and the legacy OLE2 .doc/.xls/.ppt
    best-effort (`text/olevba.py` — MS-CFB container + piece-table /
    BIFF8 / record-tree text extraction per the public format specs).
    Unparseable files are logged and skipped, never fatal.  Pass
    `binary_parsers` as {extension: callable(bytes) -> str} to add or
    override parsers."""
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
    )
    df = reader.load(path)
    from terrier_spark.text.docparsers import DEFAULT_BINARY_PARSERS

    parsers = dict(DEFAULT_BINARY_PARSERS) | dict(binary_parsers or {})
    parser_exts = tuple(parsers)

    def parse(batches):
        import logging
        import re

        import pandas as pd

        klog = logging.getLogger("terrier_spark.corpus")
        tag_re = re.compile(r"<[^>]+>")
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                ext = fpath.rsplit(".", 1)[-1].lower() if "." in fpath \
                    else ""
                if ext in parser_exts:
                    # a corrupt office/PDF file must not kill a
                    # million-file crawl (SimpleFileCollection logs and
                    # skips unparseable files, :268-274): skip the file,
                    # keep the job alive
                    try:
                        text = parsers[ext](bytes(blob))
                    except Exception as exc:
                        klog.warning(
                            "skipping unparseable .%s file %s: %s",
                            ext, fpath, exc,
                        )
                        continue
                elif ext in _BINARY_EXTS:
                    raise NotImplementedError(
                        f"no parser for .{ext} files ({fpath}): the "
                        "reference uses POI/PDFBox, which are not in "
                        "this environment — pass binary_parsers={"
                        f"{ext!r}: callable}} to from_directory"
                    )
                else:
                    text = bytes(blob).decode("utf-8", errors="replace")
                    if ext in ("html", "htm", "xhtml", "xml", "sgml"):
                        text = tag_re.sub(" ", text)
                rel = fpath.split("://", 1)[-1]
                rows.append((rel, "", rel, "HEAD", ext, text))
            if rows:
                yield pd.DataFrame(rows, columns=list(CORPUS_COLUMNS))

    return df.select("path", "content").mapInPandas(
        parse,
        schema="docno string, repo string, path string, commit string, "
               "lang string, content string",
    )


_EXTS = {"py": "python", "java": "java", "c": "c", "md": "markdown"}
_HOT = ["for", "int", "return", "class", "if", "else", "while", "void", "def"]


def synth_source_corpus(spark: SparkSession, n_docs: int = 2000,
                        seed: int = 42) -> DataFrame:
    """Generate the (repo, path, commit, lang, content) corpus driver-side
    deterministically, then parallelize.  Zipf-ish vocabulary (~5k terms)
    mixed with hot keywords for deliberate term-frequency skew, plus the
    FIXTURES.md §1 tokenizer edge cases."""
    import random

    rng = random.Random(seed)
    vocab = [f"sym{i}" for i in range(5000)]
    exts = list(_EXTS)
    rows = []
    for i in range(n_docs):
        repo = f"org{i % 7}/repo{i % 23}"
        ext = exts[i % len(exts)]
        path = f"src/d{i % 50}/f{i}.{ext}"
        commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()[:12]
        n_lines = rng.randint(3, 40)
        words = []
        for _ in range(n_lines):
            line_len = rng.randint(3, 12)
            for _ in range(line_len):
                if rng.random() < 0.35:
                    words.append(_HOT[rng.randrange(len(_HOT))])
                else:
                    # Zipf-ish: low ranks much more likely
                    r = int(rng.paretovariate(1.2)) % 5000
                    words.append(vocab[r])
            words.append("\n")
        # edge cases sprinkled deterministically
        if i % 17 == 0:
            words += ["x" * 21, "x123456", "x1234", "aaaab", "aaab",
                      "CamelCaseToken", "snake_case_token"]
        if i % 97 == 0:
            words = ["the", "of", "and"]          # stopword-only doc
        if i % 101 == 0:
            words = []                             # empty doc
        if i % 53 == 1 and i > 53:
            # duplicate content across rows (same sha256, different docids)
            words = ["duplicate", "content", "block", "alpha"]
        content = " ".join(words)
        rows.append((repo, path, commit, _EXTS[ext], content))
    df = spark.createDataFrame(
        rows, schema="repo string, path string, commit string, lang string, content string"
    )
    return from_source_code_table(df)


def zipf_token(rank: int) -> str:
    """Deterministic pure-alpha token for a vocabulary rank, shaped to
    survive the English tokeniser's validity rules (no digits, and no
    two adjacent equal letters — letter = alphabet[(2*digit + pos) % 26]
    makes adjacency require 2*(d2-d1) ≡ -1 (mod 26), impossible by
    parity — so the max-consecutive-letters rule can never fire)."""
    a = "abcdefghijklmnopqrstuvwxyz"
    return "q" + "".join(
        a[(2 * int(d) + i) % 26] for i, d in enumerate(str(rank))
    )


def synth_zipf_corpus(spark: SparkSession, n_docs: int,
                      vocab_size: int = 50_000, seed: int = 42,
                      avg_len: int = 120,
                      partitions: Optional[int] = None) -> DataFrame:
    """DISTRIBUTED deterministic corpus with a Zipf(s=1) vocabulary —
    the realistic term-frequency profile the 29-term driver testdata
    cannot provide (every term there matches ~every document, which
    makes query-side scaling unmeasurable and OOM-prone).  Content is a
    pure function of (seed, docid): generation parallelises over
    spark.range with no driver-side materialisation, so it scales to
    millions of documents.

    Term ranks are drawn by inverse-CDF sampling against the Zipf
    cumulative weights (p(r) ∝ 1/r, r = 1..vocab_size); document length
    is lognormal around avg_len.  Rank 1 appears in nearly every
    document (a stopword-like hot term), mid ranks in a few percent,
    tail ranks in a handful — a real idf spread."""
    import numpy as np
    import pandas as pd

    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    cum = np.cumsum(1.0 / ranks)
    cum /= cum[-1]
    tokens = np.array([zipf_token(r) for r in range(1, vocab_size + 1)],
                      dtype=object)
    exts = list(_EXTS)

    def gen(batches):
        for pdf in batches:
            rows = []
            for docid in pdf["id"]:
                d = int(docid)
                rng = np.random.default_rng(seed * 1_000_003 + d)
                length = max(8, int(rng.lognormal(np.log(avg_len), 0.6)))
                rs = np.searchsorted(cum, rng.random(length))
                content = " ".join(tokens[rs])
                ext = exts[d % len(exts)]
                rows.append(
                    (f"zipf{d}", f"org{d % 13}/repo{d % 101}",
                     f"src/d{d % 64}/f{d}.{ext}",
                     hashlib.sha1(f"zipf:{seed}:{d}".encode()).hexdigest()[:12],
                     _EXTS[ext], content)
                )
            yield pd.DataFrame(
                rows, columns=["docno", "repo", "path", "commit", "lang",
                               "content"],
            )

    par = partitions or spark.sparkContext.defaultParallelism * 2
    return spark.range(n_docs).repartition(par).mapInPandas(
        gen,
        schema="docno string, repo string, path string, commit string, "
               "lang string, content string",
    )


def synth_topical_corpus(spark: SparkSession, n_docs: int,
                         vocab_size: int = 50_000, n_topics: int = 50,
                         shared_frac: float = 0.02, p_shared: float = 0.35,
                         p_leak: float = 0.05, avg_len: int = 120,
                         length_sigma: float = 1.0, seed: int = 42,
                         partitions: Optional[int] = None) -> DataFrame:
    """Heterogeneous variant of synth_zipf_corpus: a MIXTURE of topic
    clusters instead of one global Zipf.  The uniform Zipf corpus is
    statistically identical everywhere, so per-bucket block-max bounds
    are near-equal and WAND's theta can never beat them (BASELINE.md
    "uniform-corpus pruning limit") — pruning was provably correct but
    demonstrably useless there.  Real corpora are not like that: a
    source-code lake clusters by repo/language, so a query's terms are
    dense in some docid ranges and absent-or-weak in the rest.

    Layout (all deterministic in (seed, docid)):
      * vocabulary = a SHARED head (ranks 1..S, S = shared_frac * vocab,
        stopword-like, Zipf s=1) + n_topics equal slices of the rest,
        each slice Zipf-distributed within itself;
      * doc topic  = docid * n_topics // n_docs (contiguous ranges);
      * each token draws shared with p_shared, a random FOREIGN topic's
        slice with p_leak (weak cross-topic postings — the case pruning
        must actually beat, not just absent postings), else its own
        slice;
      * doc length lognormal(avg_len, length_sigma) — sigma=1.0 vs the
        uniform corpus's 0.6 widens (max_tf, min_dl) spread per block;
      * repo encodes the topic (``t{topic}/repo{..}``), so building with
        IndexConfig(sort_docids_by=("repo", "path")) — the fork's docid
        reordering, InvertedIndexReordering.java:114-140 — clusters each
        topic into contiguous docid ranges and per-bucket score bounds
        become heterogeneous.  Ingest order (the default) scrambles
        topics across buckets, which is the control arm of the
        reordering experiment."""
    import numpy as np
    import pandas as pd

    n_shared = max(64, int(vocab_size * shared_frac))
    slice_size = (vocab_size - n_shared) // n_topics
    if slice_size < 16:
        raise ValueError("vocab too small for n_topics")

    def zipf_cum(n: int) -> "np.ndarray":
        c = np.cumsum(1.0 / np.arange(1, n + 1, dtype=np.float64))
        return c / c[-1]

    cum_shared = zipf_cum(n_shared)
    cum_slice = zipf_cum(slice_size)
    tokens = np.array([zipf_token(r) for r in range(1, vocab_size + 1)],
                      dtype=object)
    exts = list(_EXTS)

    def gen(batches):
        for pdf in batches:
            rows = []
            for docid in pdf["id"]:
                d = int(docid)
                topic = d * n_topics // n_docs
                rng = np.random.default_rng(seed * 1_000_003 + d)
                length = max(
                    8, int(rng.lognormal(np.log(avg_len), length_sigma))
                )
                u = rng.random(length)
                src = rng.random(length)
                shared = src < p_shared
                leak = (~shared) & (src < p_shared + p_leak)
                own = ~(shared | leak)
                rank = np.empty(length, dtype=np.int64)
                rank[shared] = np.searchsorted(cum_shared, u[shared])
                t_of = np.full(length, topic, dtype=np.int64)
                if n_topics > 1 and leak.any():
                    lt = rng.integers(0, n_topics - 1, int(leak.sum()))
                    lt[lt >= topic] += 1
                    t_of[leak] = lt
                topical = leak | own
                rank[topical] = (
                    n_shared + t_of[topical] * slice_size
                    + np.searchsorted(cum_slice, u[topical])
                )
                content = " ".join(tokens[rank])
                ext = exts[d % len(exts)]
                rows.append(
                    (f"top{d:09d}", f"t{topic:04d}/repo{d % 31}",
                     f"src/d{d % 64}/f{d}.{ext}",
                     hashlib.sha1(
                         f"topical:{seed}:{d}".encode()
                     ).hexdigest()[:12],
                     _EXTS[ext], content)
                )
            yield pd.DataFrame(
                rows, columns=["docno", "repo", "path", "commit", "lang",
                               "content"],
            )

    par = partitions or spark.sparkContext.defaultParallelism * 2
    return spark.range(n_docs).repartition(par).mapInPandas(
        gen,
        schema="docno string, repo string, path string, commit string, "
               "lang string, content string",
    )


def topical_slice_ranks(vocab_size: int = 50_000, n_topics: int = 50,
                        shared_frac: float = 0.02):
    """(n_shared, slice_size): the vocabulary geometry of
    synth_topical_corpus, for query generators that need to sample
    terms from a specific topic's slice."""
    n_shared = max(64, int(vocab_size * shared_frac))
    return n_shared, (vocab_size - n_shared) // n_topics
