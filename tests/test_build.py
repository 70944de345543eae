"""Index-build correctness: docid density, lexicon/stats consistency vs
the pure-Python oracle, sha256 invariant, VByte posting round-trip
through the full persisted index (FIXTURES.md §6, SURVEY.md §5d)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from terrier_spark.compression.vbyte import decode_scoring_block
from terrier_spark.config import IndexConfig
from terrier_spark.index.builder import build_index
from terrier_spark.index.corpus import load_documents_corpus, synth_source_corpus
from terrier_spark.oracle import OracleIndex


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index"))
    corpus = load_documents_corpus(spark, sf_dir)
    cfg = IndexConfig()
    store = build_index(spark, corpus, out, cfg, bucket_span=256)
    # oracle over the same corpus in the same docid (ingest) order
    rows = corpus.toPandas()
    contents = rows["content"].tolist()
    oracle = OracleIndex(contents, cfg.pipeline)
    return store, oracle, rows


def test_docids_dense(spark, built):
    store, oracle, rows = built
    docs = store.docs(spark).orderBy("docid").toPandas()
    n = len(docs)
    assert list(docs["docid"]) == list(range(n))
    assert n == len(rows)


def test_stats_match_oracle(spark, built):
    store, oracle, _ = built
    s = store.stats
    assert s["num_docs"] == oracle.num_docs
    assert s["num_tokens"] == oracle.num_tokens
    assert s["num_terms"] == len(oracle.postings)
    assert s["num_pointers"] == sum(len(p) for p in oracle.postings.values())
    assert s["avg_doclen"] == pytest.approx(oracle.avgdl)


def test_doclens_match_oracle(spark, built):
    store, oracle, _ = built
    docs = store.docs(spark).orderBy("docid").toPandas()
    np.testing.assert_array_equal(
        docs["doclen"].to_numpy(), np.array(oracle.doclen)
    )


def test_lexicon_matches_oracle(spark, built):
    store, oracle, _ = built
    lex = store.lexicon(spark).orderBy("term").toPandas()
    assert list(lex["term"]) == sorted(oracle.postings)
    for row in lex.itertuples():
        assert row.nt == oracle.nt(row.term), row.term
        assert row.tf == oracle.tf_collection(row.term), row.term
    # termid = dense rank in lexicographic term order (RunsMerger.java:236)
    assert list(lex["termid"]) == list(range(len(lex)))


def test_sha256_invariant(spark, built):
    store, oracle, rows = built
    import hashlib

    meta = store.meta(spark).orderBy("docid").toPandas()
    expected = [
        hashlib.sha256((c or "").encode("utf-8")).hexdigest()
        for c in rows["content"]
    ]
    assert list(meta["sha256"]) == expected
    # docno survives too
    assert list(meta["docno"]) == list(rows["docno"])


def test_postings_roundtrip_match_oracle(spark, built):
    store, oracle, _ = built
    blocks = store.postings(spark).toPandas()
    seen = {}
    for row in blocks.itertuples():
        ids, tfs, dls = decode_scoring_block(row.block)
        assert row.n == ids.size
        assert row.first_docid == ids[0] and row.last_docid == ids[-1]
        assert row.max_tf == tfs.max() and row.min_dl == dls.min()
        assert (np.diff(ids) > 0).all()  # strictly ascending docids
        for d, t, l in zip(ids, tfs, dls):
            assert oracle.doclen[d] == l
            seen.setdefault(row.term, {})[int(d)] = int(t)
    assert seen == {t: dict(p) for t, p in oracle.postings.items()}


def test_synth_corpus_build(spark, tmp_path):
    corpus = synth_source_corpus(spark, n_docs=200)
    store = build_index(spark, corpus, str(tmp_path / "idx"), bucket_span=64)
    assert store.stats["num_docs"] == 200
    meta = store.meta(spark)
    assert {
        "docid", "docno", "repo", "path", "commit", "lang", "sha256"
    } <= set(meta.columns)


def test_docid_reordering(spark, tmp_path):
    """sort_docids_by assigns docids in sort order — the fork's
    docid-reordering-for-compression experiment as one config knob."""
    corpus = synth_source_corpus(spark, n_docs=100)
    cfg = IndexConfig(sort_docids_by=("repo", "path"))
    store = build_index(spark, corpus, str(tmp_path / "idx2"), cfg, bucket_span=64)
    meta = store.meta(spark).orderBy("docid").toPandas()
    keys = list(zip(meta["repo"], meta["path"]))
    assert keys == sorted(keys)
