"""Generic DSM chain vs pure-Python mirrors of the reference DSMs
(matching/dsms/BooleanFallback.java, ResetScores.java,
BooleanScoreModifier.java, SimpleStaticScoreModifier.java)."""

import pytest

from terrier_spark.config import IndexConfig, QueryConfig
from terrier_spark.index.builder import build_index
from terrier_spark.index.corpus import synth_source_corpus
from terrier_spark.oracle import OracleIndex
from terrier_spark.query.dsms import (
    BooleanFallback,
    BooleanScoreModifier,
    ResetScores,
    SimpleStaticScoreModifier,
    search_with_dsms,
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dsmidx"))
    corpus = synth_source_corpus(spark, n_docs=250)
    cfg = IndexConfig()
    store = build_index(spark, corpus, out, cfg, bucket_span=64)
    pdf = corpus.toPandas()
    oracle = OracleIndex(pdf["content"].tolist(), cfg.pipeline)
    usable = sorted(
        t for t in oracle.postings
        if oracle.tf_collection(t) <= oracle.num_docs and oracle.nt(t) >= 5
    )
    return store, oracle, usable


def base_scores(oracle, terms):
    """Oracle BM25 accumulation over the given pipeline terms (qtf 1)."""
    out = {}
    for d, s in oracle.search(" ".join(terms), QueryConfig(k=1 << 31)):
        out[d] = s
    return out


def test_reset_scores(spark, engine):
    store, oracle, usable = engine
    q = [("q", f"{usable[0]} {usable[3]}")]
    got = search_with_dsms(
        spark, store, q, [ResetScores(0.5)], QueryConfig(k=30)
    ).orderBy("rank").toPandas()
    assert (got["score"] == 0.5).all()
    # ties broken docid asc
    assert list(got["docid"]) == sorted(got["docid"])
    # after reset, top-k = the k smallest docids of the scored pool
    exp = base_scores(oracle, [usable[0], usable[3]])
    assert list(got["docid"]) == sorted(exp)[:30]


def test_boolean_score_modifier(spark, engine):
    store, oracle, usable = engine
    a, b = usable[0], usable[3]
    got = search_with_dsms(
        spark, store, [("q", f"{a} {b}")], [BooleanScoreModifier()],
        QueryConfig(k=1000),
    ).toPandas()
    both = set(oracle.postings[a]) & set(oracle.postings[b])
    assert set(got["docid"]) == both
    # scores unchanged for survivors
    exp = base_scores(oracle, [a, b])
    for r in got.itertuples():
        assert r.score == pytest.approx(exp[r.docid], abs=1e-6)


def test_boolean_fallback_applies_and_falls_back(spark, engine):
    store, oracle, usable = engine
    a, b = usable[0], usable[3]
    both = set(oracle.postings[a]) & set(oracle.postings[b])
    assert both  # fixture sanity: the filter branch will trigger
    got = search_with_dsms(
        spark, store, [("q", f"{a} {b}")], [BooleanFallback()],
        QueryConfig(k=1000),
    ).toPandas()
    exp = base_scores(oracle, [a, b])
    survivors = {d for d, s in exp.items() if d in both or s <= 0}
    assert set(got["docid"]) == {d for d in survivors if d in exp}

    # fallback branch: no doc contains both -> ranking untouched.
    # find two usable terms with empty intersection, else synthesize by
    # using a rare term pair
    pairs = [
        (x, y) for x in usable for y in usable
        if x < y and not (set(oracle.postings[x]) & set(oracle.postings[y]))
    ]
    if pairs:
        x, y = pairs[0]
        got2 = search_with_dsms(
            spark, store, [("q", f"{x} {y}")], [BooleanFallback()],
            QueryConfig(k=1000),
        ).toPandas()
        exp2 = base_scores(oracle, [x, y])
        assert set(got2["docid"]) == set(exp2)


def test_boolean_fallback_ignores_negative_terms(spark, engine):
    store, oracle, usable = engine
    a, b, c = usable[0], usable[3], usable[6]
    # -c is negative: mask covers only {a, b}; doc must not need c
    got = search_with_dsms(
        spark, store, [("q", f"{a} {b} -{c}")], [BooleanFallback()],
        QueryConfig(k=1000),
    ).toPandas()
    both = set(oracle.postings[a]) & set(oracle.postings[b])
    in_c = set(oracle.postings[c])
    exp = base_scores(oracle, [a, b])
    # structured semantics: -c already removed docs containing c
    scored = {d: s for d, s in exp.items() if d not in in_c}
    if any(d in both for d in scored if scored[d] > 0):
        keep = {d for d, s in scored.items() if d in both or s <= 0}
    else:
        keep = set(scored)
    assert set(got["docid"]) == keep


def test_static_score_modifier(spark, engine):
    store, oracle, usable = engine
    a, b = usable[0], usable[3]
    exp = base_scores(oracle, [a, b])
    priors_rows = [(d, float((d % 7) + 1)) for d in range(250)]
    priors = spark.createDataFrame(priors_rows, "docid long, prior double")
    w, mlen = 2.5, 10
    got = search_with_dsms(
        spark, store, [("q", f"{a} {b}")],
        [SimpleStaticScoreModifier(priors, w=w, modified_length=mlen,
                                   normalise="mean1")],
        QueryConfig(k=1000),
    ).toPandas()
    mean = sum(p for _, p in priors_rows) / len(priors_rows)
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    mirror = dict(ranked)
    for i, (d, s) in enumerate(ranked):
        if i < mlen and s != 0.0:
            mirror[d] = s + w * (((d % 7) + 1) / mean)
    exp_ranked = sorted(mirror.items(), key=lambda kv: (-kv[1], kv[0]))
    got_ranked = list(zip(got["docid"], got["score"]))
    assert [d for d, _ in got_ranked] == [d for d, _ in exp_ranked]
    for (gd, gs), (ed, es) in zip(got_ranked, exp_ranked):
        assert gs == pytest.approx(es, abs=1e-6)


def test_dsm_chain_composes(spark, engine):
    """ResetScores then SimpleStaticScoreModifier = static-prior-only
    ranking of the boolean-surviving docs (a chain the reference wires
    via the matching.dsms property list)."""
    store, oracle, usable = engine
    a, b = usable[0], usable[3]
    priors = spark.createDataFrame(
        [(d, float(250 - d)) for d in range(250)], "docid long, prior double"
    )
    got = search_with_dsms(
        spark, store, [("q", f"{a} {b}")],
        [BooleanScoreModifier(), ResetScores(0.001),
         SimpleStaticScoreModifier(priors, w=1.0, modified_length=0)],
        QueryConfig(k=15),
    ).orderBy("rank").toPandas()
    both = sorted(set(oracle.postings[a]) & set(oracle.postings[b]))
    # prior = 250 - docid: ranking is ascending docid
    assert list(got["docid"]) == both[:15]


def test_dsm_rejects_unsupported_constructs(spark, engine):
    """Phrases / field restrictions / OR-groups are not applied by the
    DSM path — it must refuse them loudly, not silently drop them."""
    store, oracle, usable = engine
    a, b = usable[0], usable[1]
    for bad in [f'"{a} {b}" {a}', f"{{{a} {b}}} {a}"]:
        with pytest.raises(ValueError, match="search_structured"):
            search_with_dsms(spark, store, [("q", bad)],
                             [BooleanScoreModifier()], QueryConfig(k=5))
