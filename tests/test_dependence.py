"""Sequential-dependence proximity scoring vs a pure-Python mirror of
the reference semantics (DependenceScoreModifier + Distance +
DFRDependenceScoreModifier)."""

import math

import pytest

from terrier_spark.config import IndexConfig, QueryConfig
from terrier_spark.index.builder import build_index
from terrier_spark.index.corpus import synth_source_corpus
from terrier_spark.oracle import OracleIndex
from terrier_spark.query.dependence import sd_pair_score, search_with_sd
from terrier_spark.text.pipeline import make_pipeline


def no_times_same_order(pos1, pos2, window, dl):
    """Literal port of Distance.noTimesSameOrder(:260-283)."""
    count, i2 = 0, 0
    for p1 in pos1:
        if p1 + window > dl:
            break
        while i2 < len(pos2) and pos2[i2] - p1 < 0:
            i2 += 1
        if i2 == len(pos2):
            break
        if pos2[i2] - p1 < window:
            count += 1
    return count


def test_sd_pair_score_golden():
    # hand-computed against the scoreFDSD formula
    m, dl, avgdl = 2, 50, 40.0
    nw = dl - 2 + 1
    pfn = m * math.log2(1 + avgdl / nw)
    bg = avgdl
    p, q = 1 / bg, 1 - 1 / bg
    s = (
        (-math.lgamma(bg + 1) + math.lgamma(pfn + 1) + math.lgamma(bg - pfn + 1))
        / math.log(2)
        - pfn * math.log2(p)
        - (bg - pfn) * math.log2(q)
    ) / (1 + pfn)
    assert sd_pair_score(m, dl, avgdl) == pytest.approx(s, rel=1e-12)
    assert sd_pair_score(0, dl, avgdl) == 0.0
    # short-doc branch: nw = 1
    assert sd_pair_score(1, 1, avgdl) == pytest.approx(
        sd_pair_score(1, 1, avgdl)
    )


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sdidx"))
    corpus = synth_source_corpus(spark, n_docs=250)
    cfg = IndexConfig(positions=True)
    store = build_index(spark, corpus, out, cfg, bucket_span=64)
    pdf = corpus.toPandas()
    oracle = OracleIndex(pdf["content"].tolist(), cfg.pipeline)
    return store, oracle, pdf


def oracle_sd(oracle, pdf, query, k, avgdl, window=2, w_t=1.0, w_o=1.0):
    pipe = make_pipeline(IndexConfig().pipeline)
    base = dict(oracle.search(query, QueryConfig(k=1 << 31)))
    seen, counts = [], {}
    for t in pipe.query_terms(query):
        if t not in counts:
            seen.append(t)
        counts[t] = counts.get(t, 0) + 1
    pairs = [
        (a, b, 0.5 * counts[a] + 0.5 * counts[b])
        for a, b in zip(seen, seen[1:]) if a != b
    ]
    doc_positions = {}
    for docid, text in enumerate(pdf["content"]):
        terms = pipe.terms(text or "")
        pmap = {}
        for i, t in enumerate(terms):
            pmap.setdefault(t, []).append(i)
        doc_positions[docid] = (pmap, len(terms))
    out = {}
    for docid, s in base.items():
        score = w_t * s
        if s > 0:
            pmap, dl = doc_positions[docid]
            for a, b, qtw in pairs:
                if a in pmap and b in pmap:
                    m = no_times_same_order(pmap[a], pmap[b], window, dl)
                    score += qtw * w_o * sd_pair_score(m, dl, avgdl)
        out[docid] = score
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def _adjusted_avgdl(store, window=2):
    """DependenceScoreModifier.setCollectionStatistics (:393-397)."""
    nd = float(store.stats["num_docs"])
    return (float(store.stats["num_tokens"]) - nd * (window - 1)) / nd


def test_sd_rank_identity(spark, engine):
    store, oracle, pdf = engine
    avgdl = _adjusted_avgdl(store)
    usable = sorted(
        t for t in oracle.postings
        if oracle.tf_collection(t) <= oracle.num_docs and oracle.nt(t) >= 5
    )
    queries = [
        ("q1", f"{usable[0]} {usable[3]} {usable[6]}"),
        ("q2", f"{usable[1]} {usable[4]}"),
    ]
    got = (
        search_with_sd(spark, store, queries, QueryConfig(k=20))
        .orderBy("qid", "rank").toPandas()
    )
    by_qid = {qid: grp for qid, grp in got.groupby("qid")}
    checked = 0
    for qid, text in queries:
        exp = oracle_sd(oracle, pdf, text, 20, avgdl)
        grp = by_qid.get(qid)
        act = list(zip(grp["docid"], grp["score"])) if grp is not None else []
        assert len(act) == len(exp), qid
        checked += bool(exp)
        for (gd, gs), (ed, es) in zip(act, exp):
            assert gd == ed, f"{qid}: {gd} != {ed}"
            assert gs == pytest.approx(es, abs=1e-6)
    assert checked == 2


def no_times_unordered(pos1, pos2, window, dl):
    """Literal port of Distance.noTimes(:82-106) + windowsForTerms
    (:176-195)."""
    n = 1 if dl < window else dl - window + 1
    w1, w2 = [0] * n, [0] * n
    for pos, w in ((pos1, w1), (pos2, w2)):
        for a in pos:
            j = max(a - window + 1, 0)
            while j <= a and j < n:
                w[j] = 1
                j += 1
    return sum(1 for i in range(n) if w1[i] and w2[i])


def test_count_kernels_match_literal_ports():
    import numpy as np

    from terrier_spark.query.dependence import (
        count_same_order,
        count_unordered,
    )

    rng = __import__("random").Random(3)
    for _ in range(200):
        dl = rng.randrange(1, 40)
        pos1 = sorted(rng.sample(range(dl), min(rng.randrange(0, 8), dl)))
        rest = [p for p in range(dl) if p not in pos1]
        pos2 = sorted(rng.sample(rest, min(rng.randrange(0, 8), len(rest))))
        for window in (2, 3, 5):
            a = np.asarray(pos1, dtype=np.int64)
            b = np.asarray(pos2, dtype=np.int64)
            assert count_same_order(a, b, window, dl) == \
                no_times_same_order(pos1, pos2, window, dl), (
                    pos1, pos2, window, dl)
            assert count_unordered(a, b, window, dl) == \
                no_times_unordered(pos1, pos2, window, dl), (
                    pos1, pos2, window, dl)


def oracle_fd(oracle, pdf, query, k, avgdl, window=2, w_t=1.0, w_u=1.0):
    """FD mirror: all term pairs (i, j) i<j, unordered window counting."""
    pipe = make_pipeline(IndexConfig().pipeline)
    base = dict(oracle.search(query, QueryConfig(k=1 << 31)))
    seen, counts = [], {}
    for t in pipe.query_terms(query):
        if t not in counts:
            seen.append(t)
        counts[t] = counts.get(t, 0) + 1
    pairs = [
        (seen[i], seen[j],
         0.5 * counts[seen[i]] + 0.5 * counts[seen[j]])
        for i in range(len(seen)) for j in range(i + 1, len(seen))
        if seen[i] != seen[j]
    ]
    doc_positions = {}
    for docid, text in enumerate(pdf["content"]):
        terms = pipe.terms(text or "")
        pmap = {}
        for i, t in enumerate(terms):
            pmap.setdefault(t, []).append(i)
        doc_positions[docid] = (pmap, len(terms))
    out = {}
    for docid, s in base.items():
        score = w_t * s
        if s > 0:
            pmap, dl = doc_positions[docid]
            for a, b, qtw in pairs:
                if a in pmap and b in pmap:
                    m = no_times_unordered(pmap[a], pmap[b], window, dl)
                    score += qtw * w_u * sd_pair_score(m, dl, avgdl, window)
        out[docid] = score
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def test_fd_rank_identity(spark, engine):
    from terrier_spark.query.dependence import search_with_dependence

    store, oracle, pdf = engine
    usable = sorted(
        t for t in oracle.postings
        if oracle.tf_collection(t) <= oracle.num_docs and oracle.nt(t) >= 5
    )
    queries = [
        ("q1", f"{usable[0]} {usable[3]} {usable[6]}"),
        ("q2", f"{usable[1]} {usable[4]} {usable[7]} {usable[9]}"),
    ]
    for window in (2, 4):
        avgdl = _adjusted_avgdl(store, window)
        got = (
            search_with_dependence(
                spark, store, queries, QueryConfig(k=20),
                dependency="FD", window=window,
            )
            .orderBy("qid", "rank").toPandas()
        )
        by_qid = {qid: grp for qid, grp in got.groupby("qid")}
        checked = 0
        for qid, text in queries:
            exp = oracle_fd(oracle, pdf, text, 20, avgdl, window=window)
            grp = by_qid.get(qid)
            act = (
                list(zip(grp["docid"], grp["score"]))
                if grp is not None else []
            )
            assert len(act) == len(exp), f"{qid} w={window}"
            checked += bool(exp)
            for (gd, gs), (ed, es) in zip(act, exp):
                assert gd == ed, f"{qid} w={window}: {gd} != {ed}"
                assert gs == pytest.approx(es, abs=1e-6)
        assert checked == 2


def test_fd_counts_more_than_sd():
    """Unordered windows are a superset signal: for the same positions,
    noTimes >= noTimesSameOrder cannot be asserted in general, but for
    reversed-order occurrences FD counts where SD does not."""
    import numpy as np

    from terrier_spark.query.dependence import (
        count_same_order,
        count_unordered,
    )

    a = np.array([5], dtype=np.int64)   # term1 after term2
    b = np.array([4], dtype=np.int64)
    assert count_same_order(a, b, 2, 20) == 0
    assert count_unordered(a, b, 2, 20) == 1


def test_sd_changes_ranking_when_adjacent(spark, engine):
    """Docs with the pair adjacent must gain score relative to plain
    BM25 (sanity that the modifier has an effect)."""
    store, oracle, pdf = engine
    usable = sorted(
        t for t in oracle.postings
        if oracle.tf_collection(t) <= oracle.num_docs and oracle.nt(t) >= 5
    )
    q = f"{usable[0]} {usable[3]}"
    from terrier_spark.query.search import search

    plain = {
        r["docid"]: r["score"]
        for r in search(spark, store, [("q", q)], QueryConfig(k=1000)).collect()
    }
    sd = {
        r["docid"]: r["score"]
        for r in search_with_sd(spark, store, [("q", q)],
                                QueryConfig(k=1000)).collect()
    }
    assert set(sd) == set(plain)
    assert any(sd[d] > plain[d] + 1e-9 for d in sd) or all(
        sd[d] == pytest.approx(plain[d]) for d in sd
    )


def mrf_score_fdsd(m, dl, num_tokens, num_docs, mu, w_o):
    """Literal port of MRFDependenceScoreModifier.scoreFDSD (:70-75)
    with setCollectionStatistics' defaultCf = 2 * numDocs/100 (:86-87)."""
    default_cf = 2.0 * (num_docs / 100.0)
    return w_o * (
        math.log2(1.0 + m / (mu * (default_cf / num_tokens)))
        + math.log2(mu / (dl + mu))
    )


def test_mrf_pair_score_golden():
    from terrier_spark.query.dependence import mrf_pair_score

    for m, dl in ((0, 30), (1, 30), (5, 200), (2, 1)):
        assert mrf_pair_score(m, dl, 1e6, 1e4, 4000.0, 1.0) == pytest.approx(
            mrf_score_fdsd(m, dl, 1e6, 1e4, 4000.0, 1.0), rel=1e-12
        )
    # m == 0 is NOT zero for MRF: the pure Dirichlet length penalty
    assert mrf_pair_score(0, 30, 1e6, 1e4) == pytest.approx(
        math.log2(4000.0 / 4030.0)
    )


def oracle_mrf(oracle, pdf, query, k, num_tokens, num_docs, dependency,
               window=2, w_t=1.0, w_o=1.0, w_u=1.0, mu=4000.0):
    """MRF mirror of doDependency: pair scored whenever BOTH terms have
    a posting on the doc (okToUse), even at m == 0 (:330,:362 call
    scoreFDSD unconditionally); internal w_o * outer w_o/w_u."""
    pipe = make_pipeline(IndexConfig().pipeline)
    base = dict(oracle.search(query, QueryConfig(k=1 << 31)))
    seen, counts = [], {}
    for t in pipe.query_terms(query):
        if t not in counts:
            seen.append(t)
        counts[t] = counts.get(t, 0) + 1
    if dependency == "SD":
        combos = list(zip(seen, seen[1:]))
    else:
        combos = [
            (seen[i], seen[j])
            for i in range(len(seen)) for j in range(i + 1, len(seen))
        ]
    pairs = [
        (a, b, 0.5 * counts[a] + 0.5 * counts[b])
        for a, b in combos if a != b
    ]
    counter = (
        no_times_same_order if dependency == "SD" else no_times_unordered
    )
    pair_w = w_o if dependency == "SD" else w_u
    doc_positions = {}
    for docid, text in enumerate(pdf["content"]):
        terms = pipe.terms(text or "")
        pmap = {}
        for i, t in enumerate(terms):
            pmap.setdefault(t, []).append(i)
        doc_positions[docid] = (pmap, len(terms))
    out = {}
    for docid, s in base.items():
        score = w_t * s
        if s > 0:
            pmap, dl = doc_positions[docid]
            for a, b, qtw in pairs:
                if a in pmap and b in pmap:
                    m = counter(pmap[a], pmap[b], window, dl)
                    score += qtw * pair_w * mrf_score_fdsd(
                        m, dl, num_tokens, num_docs, mu, w_o
                    )
        out[docid] = score
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def test_mrf_rank_identity(spark, engine):
    from terrier_spark.query.dependence import search_with_dependence

    store, oracle, pdf = engine
    num_docs = float(store.stats["num_docs"])
    num_tokens = float(store.stats["num_tokens"])
    usable = sorted(
        t for t in oracle.postings
        if oracle.tf_collection(t) <= oracle.num_docs and oracle.nt(t) >= 5
    )
    queries = [
        ("q1", f"{usable[0]} {usable[3]} {usable[6]}"),
        ("q2", f"{usable[1]} {usable[4]}"),
    ]
    for dependency in ("SD", "FD"):
        got = (
            search_with_dependence(
                spark, store, queries, QueryConfig(k=20),
                dependency=dependency, variant="MRF", w_o=0.8, w_u=0.9,
            )
            .orderBy("qid", "rank").toPandas()
        )
        by_qid = {qid: grp for qid, grp in got.groupby("qid")}
        checked = 0
        for qid, text in queries:
            exp = oracle_mrf(
                oracle, pdf, text, 20, num_tokens, num_docs, dependency,
                w_o=0.8, w_u=0.9,
            )
            grp = by_qid.get(qid)
            act = (
                list(zip(grp["docid"], grp["score"]))
                if grp is not None else []
            )
            assert len(act) == len(exp), f"{qid} {dependency}"
            checked += bool(exp)
            for (gd, gs), (ed, es) in zip(act, exp):
                assert gd == ed, f"{qid} {dependency}: {gd} != {ed}"
                assert gs == pytest.approx(es, abs=1e-6)
        assert checked == 2


def test_mrf_m0_penalty_changes_scores(spark, engine):
    """MRF must differ from plain w_t-scaled BM25 on docs where both
    pair terms occur but never within the window (the m == 0 length
    penalty) — the behavior DFR deliberately lacks."""
    store, oracle, pdf = engine
    from terrier_spark.query.dependence import search_with_dependence
    from terrier_spark.query.search import search

    usable = sorted(
        t for t in oracle.postings
        if oracle.tf_collection(t) <= oracle.num_docs and oracle.nt(t) >= 5
    )
    q = f"{usable[0]} {usable[3]}"
    plain = {
        r["docid"]: r["score"]
        for r in search(spark, store, [("q", q)],
                        QueryConfig(k=1000)).collect()
    }
    mrf = {
        r["docid"]: r["score"]
        for r in search_with_dependence(
            spark, store, [("q", q)], QueryConfig(k=1000), variant="MRF"
        ).collect()
    }
    assert set(mrf) == set(plain)
    pipe = make_pipeline(IndexConfig().pipeline)
    t1, t2 = pipe.query_terms(q)[:2]
    both_m0 = None
    for docid, text in enumerate(pdf["content"]):
        terms = pipe.terms(text or "")
        pos = {t: [i for i, s in enumerate(terms) if s == t]
               for t in (t1, t2)}
        if (pos[t1] and pos[t2] and plain.get(docid, 0) > 0
                and no_times_same_order(pos[t1], pos[t2], 2,
                                        len(terms)) == 0):
            both_m0 = docid
            break
    if both_m0 is not None:
        assert mrf[both_m0] != pytest.approx(plain[both_m0])
