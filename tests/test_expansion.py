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
