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
