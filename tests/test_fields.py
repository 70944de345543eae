"""Field indexing: per-field tfs/lengths, BM25F rank identity vs the
field oracle, field-restricted structured queries."""

import math

import numpy as np
import pytest

from terrier_spark.config import IndexConfig, QueryConfig
from terrier_spark.index.builder import build_index
from terrier_spark.index.corpus import synth_source_corpus
from terrier_spark.oracle import OracleFieldIndex
from terrier_spark.query.models import bm25f
from terrier_spark.query.search import search
from terrier_spark.query.structured import search_structured

FIELD_COLS = (("path", "path"), ("content", "content"))


def test_bm25f_kernel_golden():
    # one posting, two fields, hand-computed
    ftf = np.array([[2.0, 3.0]])
    fln = np.array([[4.0, 100.0]])
    avg = [5.0, 80.0]
    w, c = [2.0, 1.0], [0.5, 0.75]
    N, nt, qtf = 1000, 50, 1.0
    tfn = (
        w[0] * 2.0 / (1 - c[0] + c[0] * 4.0 / avg[0])
        + w[1] * 3.0 / (1 - c[1] + c[1] * 100.0 / avg[1])
    )
    exp = (
        (9.0 * qtf / (8.0 + qtf))
        * (2.2 * tfn / (1.2 + tfn))
        * math.log2((N - nt + 0.5) / (nt + 0.5))
    )
    got = bm25f(ftf, fln, qtf, nt, 500, N, w, c, avg, 100_000)
    assert float(got[0]) == pytest.approx(exp, rel=1e-12)
    # zero in one field: that field contributes nothing
    got0 = bm25f(np.array([[0.0, 0.0]]), fln, qtf, nt, 500, N, w, c, avg,
                 100_000)
    assert float(got0[0]) == 0.0


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fidx"))
    corpus = synth_source_corpus(spark, n_docs=250)
    cfg = IndexConfig(field_cols=FIELD_COLS)
    store = build_index(spark, corpus, out, cfg, bucket_span=64)
    pdf = corpus.toPandas()
    oracle = OracleFieldIndex(
        list(zip(pdf["path"], pdf["content"])), cfg.pipeline
    )
    return store, oracle, pdf


def test_field_stats(spark, engine):
    store, oracle, pdf = engine
    assert store.stats["fields"] == ["path", "content"]
    assert store.stats["avg_field_lens"] == pytest.approx(
        oracle.avg_field_lens
    )
    # doclen = sum of field lens
    meta = store.meta(spark).orderBy("docid").toPandas()
    for row in meta.itertuples():
        assert row.doclen == sum(row.field_lens)
        assert list(row.field_lens) == oracle.field_lens[row.docid]


def test_bm25f_rank_identity(spark, engine):
    store, oracle, _ = engine
    queries = [
        ("q1", "sym1 py sym7"),      # 'py' appears in path extensions
        ("q2", "src sym0 class"),    # 'src' is in every path
        ("q3", "sym12 sym3"),
    ]
    qcfg = QueryConfig(k=20, model="BM25F", ignore_low_idf=False)
    got = search(spark, store, queries, qcfg).orderBy("qid", "rank").toPandas()
    by_qid = {qid: grp for qid, grp in got.groupby("qid")}
    nonempty = 0
    for qid, text in queries:
        exp = oracle.search_bm25f(text, k=20)
        grp = by_qid.get(qid)
        act = list(zip(grp["docid"], grp["score"])) if grp is not None else []
        assert len(act) == len(exp), qid
        nonempty += bool(exp)
        for (gd, gs), (ed, es) in zip(act, exp):
            assert gd == ed, f"{qid}: {gd} != {ed}"
            assert gs == pytest.approx(es, abs=1e-6)
    assert nonempty >= 2


def test_bm25f_with_weights(spark, engine):
    store, oracle, _ = engine
    qcfg = QueryConfig(k=10, model="BM25F", ignore_low_idf=False,
                       field_weights=(3.0, 1.0), field_c=(0.4, 0.9))
    got = search(spark, store, [("q", "py sym1")], qcfg).orderBy("rank").toPandas()
    exp = oracle.search_bm25f("py sym1", k=10, weights=[3.0, 1.0],
                              cs=[0.4, 0.9])
    assert list(got["docid"]) == [d for d, _ in exp]
    for g, (_, s) in zip(got["score"], exp):
        assert g == pytest.approx(s, abs=1e-6)


def test_field_restriction(spark, engine):
    store, oracle, pdf = engine
    # path:java — only docs whose path tokenizes to contain 'java'
    res = search_structured(
        spark, store, [("q", "sym1 path:java")],
        QueryConfig(k=200, ignore_low_idf=False),
    ).toPandas()
    assert len(res) > 0
    java_docs = {
        i for i, p in enumerate(pdf["path"]) if "java" in p.split(".")
    }
    assert set(res["docid"]) <= java_docs
    # unknown field is loud
    with pytest.raises(Exception, match="field"):
        search_structured(
            spark, store, [("q", "title:foo")], QueryConfig(k=5)
        ).collect()
