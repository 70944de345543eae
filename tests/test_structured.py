"""Query parser + structured retrieval (required/negative/phrase/boost)."""

import pytest

from terrier_spark.config import IndexConfig, QueryConfig
from terrier_spark.index.builder import build_index
from terrier_spark.index.corpus import synth_source_corpus
from terrier_spark.oracle import OracleIndex
from terrier_spark.query.parser import parse_query
from terrier_spark.query.search import search
from terrier_spark.query.structured import search_structured


def test_parse_query():
    p = parse_query('alpha +beta -gamma delta^2.5 "one two"~3 "three four"')
    assert ("alpha", 1.0) in p.terms and ("delta", 2.5) in p.terms
    assert p.required == ["beta"] and p.negative == ["gamma"]
    assert (["one", "two"], 3) in p.phrases
    assert (["three", "four"], None) in p.phrases
    # phrase members also score
    assert ("one", 1.0) in p.terms and ("four", 1.0) in p.terms
    # negative terms do NOT score
    assert all(t != "gamma" for t, _ in p.terms)


def test_field_restriction_is_loud():
    with pytest.raises(ValueError, match="field restriction"):
        parse_query("lang:python code")


def test_malformed_grouping_raises():
    """Unbalanced / nested grouping is rejected (the reference ANTLR
    grammar errors on it) instead of silently mis-parsing."""
    for bad in ["(a (b c))", "[a b", "a)", "(a b", "a]", "{a b",
                'un"closed']:
        with pytest.raises(ValueError, match="malformed query"):
            parse_query(bad)
    # balanced constructs still parse
    parse_query('(a b) [c d] {e f} "g h"')


def test_parse_groups_segments_disjunctions():
    # disjunctive group -> one OR-synthetic term (terrier.g:196-209)
    p = parse_query("alpha {beta gamma} delta")
    assert p.disjunctions == [["beta", "gamma"]]
    assert ("alpha", 1.0) in p.terms and ("delta", 1.0) in p.terms
    assert all(t not in ("beta", "gamma") for t, _ in p.terms)
    # single-member "group" degrades to a plain term
    p1 = parse_query("{solo} rest")
    assert p1.disjunctions == [] and ("solo", 1.0) in p1.terms
    # segments are pure grouping: members parse as if unbracketed
    p2 = parse_query("[alpha +beta] -gamma")
    assert ("alpha", 1.0) in p2.terms
    assert p2.required == ["beta"] and p2.negative == ["gamma"]
    # explicit parens distribute the leading modifier
    p3 = parse_query("+(alpha beta) rest")
    assert set(p3.required) == {"alpha", "beta"}
    p4 = parse_query("-(alpha beta) rest")
    assert set(p4.negative) == {"alpha", "beta"}
    assert [t for t, _ in p4.terms] == ["rest"]
    # field-prefixed group distributes the field restriction
    p5 = parse_query("path:(py java) rest", fields=("path",))
    assert set(p5.field_terms) == {("path", "py"), ("path", "java")}


def test_disjunction_rank_identity(spark, engine):
    """{a b} scores as ONE synthetic term: OR postings with summed tf and
    statistics merged by addition, matching
    PostingListManager.addSingleTermAlternatives(:278-324)."""
    import math

    store, oracle = engine
    usable = sorted(
        t for t in oracle.postings
        if oracle.tf_collection(t) <= oracle.num_docs and oracle.nt(t) >= 5
    )
    a, b, c = usable[0], usable[3], usable[6]
    got = search_structured(
        spark, store, [("q", f"{c} {{{a} {b}}}")], QueryConfig(k=30)
    ).orderBy("rank").toPandas()
    N, avgdl = oracle.num_docs, oracle.avgdl
    acc = {}
    # single term c
    nt_c = oracle.nt(c)
    idf_c = math.log2((N - nt_c + 0.5) / (nt_c + 0.5))
    for d, tf in oracle.postings[c].items():
        K = 1.2 * (0.25 + 0.75 * oracle.doclen[d] / avgdl) + tf
        acc[d] = acc.get(d, 0.0) + tf / K * idf_c
    # group {a b}: merged stats, summed tf
    nt_g = oracle.nt(a) + oracle.nt(b)
    idf_g = math.log2((N - nt_g + 0.5) / (nt_g + 0.5))
    gtf = {}
    for t in (a, b):
        for d, tf in oracle.postings[t].items():
            gtf[d] = gtf.get(d, 0) + tf
    for d, tf in gtf.items():
        K = 1.2 * (0.25 + 0.75 * oracle.doclen[d] / avgdl) + tf
        acc[d] = acc.get(d, 0.0) + tf / K * idf_g
    exp = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert list(got["docid"]) == [d for d, _ in exp]
    for g, (_, s) in zip(got["score"], exp):
        assert g == pytest.approx(s, abs=1e-6)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stridx"))
    corpus = synth_source_corpus(spark, n_docs=250)
    cfg = IndexConfig(positions=True)
    store = build_index(spark, corpus, out, cfg, bucket_span=128)
    oracle = OracleIndex(corpus.toPandas()["content"].tolist(), cfg.pipeline)
    return store, oracle


def _usable(oracle, min_nt=5):
    return sorted(
        t for t in oracle.postings
        if oracle.tf_collection(t) <= oracle.num_docs and oracle.nt(t) >= min_nt
    )


def test_plain_structured_equals_search(spark, engine):
    store, oracle = engine
    u = _usable(oracle)
    q = [("q", f"{u[0]} {u[2]} {u[4]}")]
    a = search_structured(spark, store, q, QueryConfig(k=15)).orderBy("rank").collect()
    b = search(spark, store, q, QueryConfig(k=15)).orderBy("rank").collect()
    assert [(r["docid"], r["score"]) for r in a] == [
        (r["docid"], r["score"]) for r in b
    ]


def test_required_term(spark, engine):
    store, oracle = engine
    u = _usable(oracle)
    t_score, t_req = u[0], u[1]
    res = search_structured(
        spark, store, [("q", f"{t_score} +{t_req}")], QueryConfig(k=100)
    ).collect()
    req_docs = set(oracle.postings[t_req])
    assert res
    assert all(r["docid"] in req_docs for r in res)


def test_negative_term(spark, engine):
    store, oracle = engine
    u = _usable(oracle)
    # pick a pair whose doc sets properly overlap but are not identical
    t_score, t_neg = None, None
    for a in u:
        for b in u:
            if a != b and (
                set(oracle.postings[a]) - set(oracle.postings[b])
            ):
                t_score, t_neg = a, b
                break
        if t_score:
            break
    assert t_score and t_neg
    res = search_structured(
        spark, store, [("q", f"{t_score} -{t_neg}")], QueryConfig(k=100)
    ).collect()
    neg_docs = set(oracle.postings[t_neg])
    assert res
    assert all(r["docid"] not in neg_docs for r in res)
    # and the negative term contributed nothing to scores: compare with
    # plain search on the positive term filtered manually
    plain = search(spark, store, [("q", t_score)], QueryConfig(k=100)).collect()
    expected = {
        r["docid"]: r["score"] for r in plain if r["docid"] not in neg_docs
    }
    got = {r["docid"]: r["score"] for r in res}
    assert got == pytest.approx(expected)


def _kept_streams(spark):
    """Recompute the fixture corpus's kept-term streams (positions index
    the kept pipeline stream, BlockIndexer semantics) — an independent
    positional oracle."""
    from terrier_spark.text.pipeline import make_pipeline

    contents = (
        synth_source_corpus(spark, n_docs=250).toPandas()["content"].tolist()
    )
    pipe = make_pipeline(IndexConfig(positions=True).pipeline)
    return [pipe.terms(c) for c in contents]


def _phrase_match(stream, terms):
    pos = {t: [i for i, s in enumerate(stream) if s == t] for t in set(terms)}
    starts = set(pos[terms[0]])
    for off, t in enumerate(terms[1:], start=1):
        starts &= {p - off for p in pos[t]}
        if not starts:
            return False
    return True


def _prox_match(stream, terms, window):
    pos = {t: [i for i, s in enumerate(stream) if s == t] for t in set(terms)}
    anchors = list(pos[terms[0]])
    for t in terms[1:]:
        anchors = [
            a for a in anchors if any(abs(p - a) <= window for p in pos[t])
        ]
        if not anchors:
            return False
    return True


def test_batch_phrase_flat_plan(spark, engine):
    """≥50 phrase/proximity queries in one batch run through ONE flat
    plan (no per-query union chain), and every query's result set matches
    an independent pure-Python positional oracle."""
    store, oracle = engine
    streams = _kept_streams(spark)
    u = _usable(oracle, min_nt=3)
    queries, expected = [], {}
    for i in range(60):
        t1, t2 = u[i % len(u)], u[(i * 7 + 3) % len(u)]
        if t1 == t2:
            t2 = u[(i * 7 + 4) % len(u)]
        qid = f"q{i}"
        if i % 2 == 0:
            queries.append((qid, f'"{t1} {t2}"'))
            expected[qid] = {
                d for d, s in enumerate(streams) if _phrase_match(s, [t1, t2])
            }
        else:
            queries.append((qid, f'"{t1} {t2}"~5'))
            expected[qid] = {
                d for d, s in enumerate(streams)
                if _prox_match(s, [t1, t2], 5)
            }
    res = search_structured(spark, store, queries, QueryConfig(k=1000))
    # flat plan: the old per-query loop produced one Union per phrase
    # query; the batched path has exactly one Union total
    plan = res._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Union") <= 2, "per-query union chain is back"
    got = res.toPandas()
    by_qid = {
        qid: set(g["docid"]) for qid, g in got.groupby("qid")
    }
    for qid, _ in queries:
        assert by_qid.get(qid, set()) == expected[qid], qid


def test_batch_hits_matches_single_job_paths(spark, engine):
    """batch_hits agrees with the independent phrase_docs /
    proximity_docs implementations, including >2-term jobs and duplicate
    terms in a phrase."""
    from terrier_spark.query.positional import (
        batch_hits, phrase_docs, proximity_docs,
    )

    store, oracle = engine
    u = _usable(oracle, min_nt=3)
    jobs = [
        (0, [u[0], u[1]], None),
        (1, [u[2], u[3]], 4),
        (2, [u[0], u[1], u[2]], None),
        (3, [u[4], u[5], u[6]], 8),
        (4, [u[0], u[0]], None),  # duplicate term in phrase
    ]
    hits = batch_hits(spark, store, jobs).toPandas()
    by_job = {j: set(g["docid"]) for j, g in hits.groupby("job_id")}
    for job_id, terms, window in jobs:
        if window is None:
            want = {r["docid"] for r in phrase_docs(spark, store, terms).collect()}
        else:
            want = {
                r["docid"]
                for r in proximity_docs(spark, store, terms, window).collect()
            }
        assert by_job.get(job_id, set()) == want, (job_id, terms, window)


def test_phrase_constraint(spark, engine):
    store, oracle = engine
    # find an actual adjacent pair in some document's kept-term stream
    pair = None
    from terrier_spark.text.pipeline import make_pipeline

    pipe = make_pipeline(IndexConfig().pipeline)
    # reconstruct streams from oracle postings is lossy; instead scan a
    # few docs' contents via doclen order — use corpus directly
    # (oracle.postings lacks positions, so recompute)
    for docid in range(oracle.num_docs):
        # cheap: pick from *any* doc with doclen >= 2
        if oracle.doclen[docid] >= 2:
            pass
    # simpler: use a loaded document content via store.meta is heavy;
    # just assert phrase results are a subset of AND results
    u = _usable(oracle)
    t1, t2 = u[0], u[1]
    phrase = search_structured(
        spark, store, [("q", f'"{t1} {t2}"')], QueryConfig(k=1000)
    ).collect()
    both = set(oracle.postings[t1]) & set(oracle.postings[t2])
    assert all(r["docid"] in both for r in phrase)
    prox = search_structured(
        spark, store, [("q", f'"{t1} {t2}"~50')], QueryConfig(k=1000)
    ).collect()
    # proximity with a wide window admits at least as many as the phrase
    assert len(prox) >= len(phrase)
    assert all(r["docid"] in both for r in prox)
