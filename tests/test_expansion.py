"""Direct index + Bo1 query expansion vs the pure-Python oracle."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from terrier_spark.config import IndexConfig, QueryConfig
from terrier_spark.index.builder import build_index
from terrier_spark.index.corpus import synth_source_corpus
from terrier_spark.oracle import OracleIndex
from terrier_spark.query.expansion import (
    build_direct_index,
    direct_index,
    expand_queries,
    search_with_expansion,
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("eidx"))
    corpus = synth_source_corpus(spark, n_docs=300)
    cfg = IndexConfig()
    store = build_index(spark, corpus, out, cfg, bucket_span=128)
    oracle = OracleIndex(corpus.toPandas()["content"].tolist(), cfg.pipeline)
    return store, oracle


def test_direct_index_transpose(spark, engine):
    store, oracle = engine
    direct = direct_index(spark, store).toPandas()
    got = {
        (int(r.docid), r.term): int(r.tf) for r in direct.itertuples()
    }
    exp = {
        (docid, term): tf
        for term, plist in oracle.postings.items()
        for docid, tf in plist.items()
    }
    assert got == exp


def test_expansion_rank_identity(spark, engine):
    store, oracle = engine
    # pick terms that survive the low-idf drop (tf_c <= N) and have
    # enough postings to produce feedback docs
    usable = sorted(
        t for t in oracle.postings
        if oracle.tf_collection(t) <= oracle.num_docs and oracle.nt(t) >= 5
    )
    assert len(usable) >= 8
    queries = [
        ("q1", f"{usable[0]} {usable[3]} {usable[6]}"),
        ("q2", f"{usable[1]} {usable[4]} {usable[7]} {usable[2]}"),
        ("q3", f"{usable[5]} {usable[0]}"),
        ("q4", "zzznotaword"),           # no feedback -> original query
    ]
    qcfg = QueryConfig(k=20)
    got = (
        search_with_expansion(spark, store, queries, qcfg)
        .orderBy("qid", "rank").toPandas()
    )
    by_qid = {qid: grp for qid, grp in got.groupby("qid")}
    checked = 0
    for qid, text in queries:
        exp = oracle.search_with_expansion(text, qcfg)
        grp = by_qid.get(qid)
        act = list(zip(grp["docid"], grp["score"])) if grp is not None else []
        assert len(act) == len(exp), qid
        for (gd, gs), (ed, es) in zip(act, exp):
            assert gd == ed, f"{qid}: {gd} != {ed}"
            assert gs == pytest.approx(es, abs=1e-6)
        checked += bool(exp)
    assert checked >= 3


def test_qe_weight_goldens():
    """Hand-computed Bo2/KL weights + normalisers (Bo2.java, KL.java)."""
    import numpy as np

    from terrier_spark.query.expansion import QE_MODELS

    tfx, F, N, total_dl, T = 4.0, 120.0, 1000, 300.0, 90000
    w2, n2 = QE_MODELS["Bo2"]
    f = tfx * total_dl / T
    exp_w = tfx * math.log2((1 + f) / f) + math.log2(1 + f)
    assert float(w2(np.array([tfx]), np.array([F]), N, total_dl, T)[0]) == \
        pytest.approx(exp_w, rel=1e-12)
    f_max = tfx * total_dl / T
    exp_n = tfx * math.log2((1 + f_max) / f_max) + math.log2(1 + f_max)
    assert n2(tfx, total_dl, T, 80.0) == pytest.approx(exp_n, rel=1e-12)

    wk, nk = QE_MODELS["KL"]
    px, pc = tfx / total_dl, F / T
    exp_w = px * math.log2(px / pc)
    assert float(wk(np.array([tfx]), np.array([F]), N, total_dl, T)[0]) == \
        pytest.approx(exp_w, rel=1e-12)
    # below-collection-probability terms get zero
    assert float(wk(np.array([0.001]), np.array([F]), N, total_dl, T)[0]) == 0.0
    exp_n = tfx * math.log(T / total_dl) / (math.log(2.0) * total_dl)
    assert nk(tfx, total_dl, T, 80.0) == pytest.approx(exp_n, rel=1e-12)


@pytest.mark.parametrize("qe_model", ["Bo1", "Bo2", "KL", "BA", "CS"])
def test_expansion_rank_identity_per_qe_model(spark, engine, qe_model):
    store, oracle = engine
    usable = sorted(
        t for t in oracle.postings
        if oracle.tf_collection(t) <= oracle.num_docs and oracle.nt(t) >= 5
    )
    queries = [("q1", f"{usable[0]} {usable[3]} {usable[6]}")]
    qcfg = QueryConfig(k=15)
    got = (
        search_with_expansion(spark, store, queries, qcfg, qe_model=qe_model)
        .orderBy("rank").toPandas()
    )
    exp = oracle.search_with_expansion(queries[0][1], qcfg, qe_model=qe_model)
    assert len(got) == len(exp) and len(exp) > 0
    assert list(got["docid"]) == [d for d, _ in exp], qe_model
    for g, (_, s) in zip(got["score"], exp):
        assert g == pytest.approx(s, abs=1e-6)


def test_expansion_adds_terms(spark, engine):
    store, oracle = engine
    usable = sorted(
        t for t in oracle.postings
        if oracle.tf_collection(t) <= oracle.num_docs and oracle.nt(t) >= 5
    )
    t1, t2 = usable[0], usable[3]
    expanded = expand_queries(spark, store, [("q", f"{t1} {t2}")],
                              QueryConfig(k=10))
    assert len(expanded) > 2          # new terms beyond the originals
    orig = expanded[expanded["term"].isin([t1, t2])]
    # original terms got 1.0 + normalized expansion weight when selected
    assert (orig["qtf"] >= 1.0).all()
