"""Post-filter chain: decorate / scope / site (Manager runPostFilters)."""

import pytest

from terrier_spark.config import IndexConfig, QueryConfig
from terrier_spark.index.builder import build_index
from terrier_spark.index.corpus import synth_source_corpus
from terrier_spark.query.postfilters import decorate, scope_filter, site_filter
from terrier_spark.query.search import search


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pfidx"))
    corpus = synth_source_corpus(spark, n_docs=200)
    store = build_index(spark, corpus, out, IndexConfig(), bucket_span=64)
    return store


def test_decorate_and_filters(spark, engine):
    store = engine
    res = search(spark, store, [("q", "sym1 sym3 sym5")],
                 QueryConfig(k=100))
    dec = decorate(spark, store, res)
    assert {"docno", "repo", "path", "lang", "sha256"} <= set(dec.columns)
    assert dec.count() == res.count()

    by_site = site_filter(spark, store, res, "org1/repo1").toPandas()
    assert (by_site["repo"] == "org1/repo1").all()
    # ranks re-numbered densely from 0
    for _, grp in by_site.groupby("qid"):
        assert sorted(grp["rank"]) == list(range(len(grp)))

    scoped = scope_filter(spark, store, res, "org2/").toPandas()
    assert all(d.startswith("org2/") for d in scoped["docno"])
