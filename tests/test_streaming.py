"""Incremental / streaming indexing: batch appends, idempotent retries,
global docids across batches, end-to-end Structured Streaming run."""

import os

import pytest
from pyspark.sql import functions as F

from terrier_spark.config import IndexConfig, QueryConfig
from terrier_spark.index.corpus import synth_source_corpus
from terrier_spark.index.store import IndexStore
from terrier_spark.oracle import OracleIndex
from terrier_spark.query.search import search
from terrier_spark.streaming.incremental import IncrementalIndexer


def _oracle_for(spark, store, corpus_pdf):
    """Oracle over contents in engine-docid order (robust to arrival
    order)."""
    meta = store.meta(spark).orderBy("docid").toPandas()
    by_docno = dict(zip(corpus_pdf["docno"], corpus_pdf["content"]))
    contents = [by_docno[d] for d in meta["docno"]]
    return OracleIndex(contents, IndexConfig().pipeline)


def test_incremental_batches_match_oracle(spark, tmp_path):
    corpus = synth_source_corpus(spark, n_docs=150)
    pdf = corpus.toPandas()
    out = str(tmp_path / "inc")
    inc = IncrementalIndexer(out, bucket_span=64)
    chunks = [pdf.iloc[0:50], pdf.iloc[50:110], pdf.iloc[110:150]]
    for i, chunk in enumerate(chunks):
        df = spark.createDataFrame(chunk).repartition(2)
        inc.index_batch(df, i)
    store = inc.finalize()
    assert store.stats["num_docs"] == 150

    # docids dense and global across batches
    docs = store.docs(spark).orderBy("docid").toPandas()
    assert list(docs["docid"]) == list(range(150))

    oracle = _oracle_for(spark, store, pdf)
    q = "sym1 sym2 class return"
    got = search(spark, store, [("q", q)], QueryConfig(k=20)).orderBy("rank").toPandas()
    exp = oracle.search(q, QueryConfig(k=20))
    assert list(got["docid"]) == [d for d, _ in exp]
    for g, (_, s) in zip(got["score"], exp):
        assert g == pytest.approx(s, abs=1e-6)


def test_batch_retry_is_idempotent(spark, tmp_path):
    corpus = synth_source_corpus(spark, n_docs=60)
    pdf = corpus.toPandas()
    out = str(tmp_path / "inc2")
    inc = IncrementalIndexer(out, bucket_span=64)
    df0 = spark.createDataFrame(pdf.iloc[0:30]).repartition(2)
    df1 = spark.createDataFrame(pdf.iloc[30:60]).repartition(2)
    inc.index_batch(df0, 0)
    inc.index_batch(df1, 1)
    before = IndexStore(out).stats
    inc.index_batch(df1, 1)  # retried batch must be a no-op
    inc.finalize()
    assert IndexStore(out).stats == before
    assert IndexStore(out).stats["num_docs"] == 60


def test_delete_policy_fixed_size(spark, tmp_path):
    """deleteFixedSize retention (IncrementalDeleteFixedNumber.java):
    only the most recent N batch shards survive; older batches' docs
    disappear from the index, and a compaction covering a dropped shard
    is invalidated rather than served stale."""
    corpus = synth_source_corpus(spark, n_docs=120)
    pdf = corpus.toPandas()
    out = str(tmp_path / "del")
    inc = IncrementalIndexer(out, bucket_span=64,
                             delete_policy="deleteFixedSize",
                             keep_most_recent=2, compact_every=1)
    chunks = [pdf.iloc[0:40], pdf.iloc[40:80], pdf.iloc[80:120]]
    for i, chunk in enumerate(chunks):
        inc.index_batch(spark.createDataFrame(chunk).repartition(2), i)
    store = inc.finalize()
    # batch 0 evicted: only docids 40..119 remain
    docids = sorted(r["docid"] for r in store.docs(spark).collect())
    assert docids == list(range(40, 120))
    assert store.stats["num_docs"] == 80
    # no posting mentions an evicted docid
    from terrier_spark.compression.vbyte import decode_scoring_block

    for row in store.postings(spark).collect():
        ids, _, _ = decode_scoring_block(row["block"])
        assert (ids >= 40).all()
    # retrieval serves only retained docs, matching an oracle over
    # exactly those 80 (collection stats shrink with the eviction);
    # engine docid = oracle docid + 40, an order-preserving shift
    oracle = OracleIndex(list(pdf["content"].iloc[40:120]),
                         IndexConfig().pipeline)
    got = search(spark, store, [("q", "sym1 sym2")],
                 QueryConfig(k=15)).orderBy("rank").toPandas()
    exp = [(d + 40, s) for d, s in
           oracle.search("sym1 sym2", QueryConfig(k=15))]
    assert list(got["docid"]) == [d for d, _ in exp]
    for g, (_, s) in zip(got["score"], exp):
        assert g == pytest.approx(s, abs=1e-6)

    with pytest.raises(ValueError, match="delete_policy"):
        IncrementalIndexer(str(tmp_path / "x"), delete_policy="bogus")


def test_structured_streaming_end_to_end(spark, tmp_path):
    corpus = synth_source_corpus(spark, n_docs=90)
    pdf = corpus.toPandas()
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, sl in enumerate([pdf.iloc[0:30], pdf.iloc[30:60], pdf.iloc[60:90]]):
        spark.createDataFrame(sl).coalesce(1).write.parquet(f"{src}/f{i:02d}")

    out = str(tmp_path / "sidx")
    inc = IncrementalIndexer(out, bucket_span=64)
    schema = spark.read.parquet(f"{src}/f00").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    query = inc.attach(stream)
    query.awaitTermination(120)
    store = inc.finalize()
    assert store.stats["num_docs"] == 90

    oracle = _oracle_for(spark, store, pdf)
    got = search(spark, store, [("q", "sym0 sym3")], QueryConfig(k=10)).orderBy(
        "rank"
    ).toPandas()
    exp = oracle.search("sym0 sym3", QueryConfig(k=10))
    assert list(got["docid"]) == [d for d, _ in exp]
