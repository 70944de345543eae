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
