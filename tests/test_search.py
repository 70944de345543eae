"""Retrieval correctness: rank-identity + score equality (1e-6) vs the
pure-Python oracle; pruned == unpruned; low-idf drop; tie-break pinning
(FIXTURES.md §4-5)."""

import random
from dataclasses import replace

import pytest

from terrier_spark.config import IndexConfig, QueryConfig
from terrier_spark.index.builder import build_index
from terrier_spark.index.corpus import load_documents_corpus
from terrier_spark.oracle import OracleIndex
from terrier_spark.query.search import search


def make_queries(oracle, n_per_bucket=3, seed=42):
    """Reference-style query set (FIXTURES.md §4): length buckets 2..10,
    terms sampled from the corpus vocabulary + stopwords + OOV terms."""
    rng = random.Random(seed)
    vocab = sorted(oracle.postings)
    queries = []
    qid = 0
    for length in range(2, 11):
        for _ in range(n_per_bucket):
            terms = [vocab[rng.randrange(len(vocab))] for _ in range(length)]
            if length % 3 == 0:
                terms[0] = "the"            # stopword
            if length % 4 == 0:
                terms[-1] = "zzqqoovvx"     # out-of-vocabulary
            queries.append((str(qid), " ".join(terms)))
            qid += 1
    return queries


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("qindex"))
    corpus = load_documents_corpus(spark, sf_dir)
    cfg = IndexConfig()
    store = build_index(spark, corpus, out, cfg, bucket_span=128)
    contents = corpus.toPandas()["content"].tolist()
    oracle = OracleIndex(contents, cfg.pipeline)
    return store, oracle


def run_and_compare(spark, store, oracle, queries, qcfg):
    got = (
        search(spark, store, queries, qcfg)
        .orderBy("qid", "rank")
        .toPandas()
    )
    by_qid = {qid: grp for qid, grp in got.groupby("qid")}
    for qid, text in queries:
        expected = oracle.search(text, qcfg)
        grp = by_qid.get(qid)
        actual = (
            list(zip(grp["docid"], grp["score"])) if grp is not None else []
        )
        assert len(actual) == len(expected), f"qid={qid} size mismatch"
        for (gd, gs), (ed, es) in zip(actual, expected):
            assert gd == ed, f"qid={qid}: docid {gd} != {ed}"
            assert gs == pytest.approx(es, abs=1e-6), f"qid={qid} docid={gd}"
        if grp is not None:
            assert list(grp["rank"]) == list(range(len(actual)))


def test_rank_identity_unpruned(spark, engine):
    # NOTE: the testdata documents corpus has a tiny vocabulary, so every
    # term is "low idf" (collection frequency > N) and the default drop
    # would empty all results — disable it here so the comparison is a
    # real scoring check; the drop itself is covered by test_low_idf_drop
    # and the synth-corpus test exercises the default config.
    store, oracle = engine
    queries = make_queries(oracle)
    run_and_compare(spark, store, oracle, queries,
                    QueryConfig(k=50, prune=False, ignore_low_idf=False))


def test_rank_identity_pruned(spark, engine):
    store, oracle = engine
    queries = make_queries(oracle)
    run_and_compare(spark, store, oracle, queries,
                    QueryConfig(k=50, prune=True, prune_min_postings=0, prune_min_buckets=0, ignore_low_idf=False))


def test_rank_identity_synth_corpus(spark, tmp_path):
    """Default config (low-idf drop ON) over the synthetic source-code
    corpus: 5k-term Zipf vocabulary gives a real idf spread, so this is
    the non-vacuous default-path check."""
    from terrier_spark.index.corpus import synth_source_corpus

    corpus = synth_source_corpus(spark, n_docs=400)
    cfg = IndexConfig()
    store = build_index(spark, corpus, str(tmp_path / "sidx"), cfg,
                        bucket_span=128)
    oracle = OracleIndex(corpus.toPandas()["content"].tolist(), cfg.pipeline)
    queries = make_queries(oracle, n_per_bucket=2, seed=11)
    qcfg = QueryConfig(k=30)
    # sanity: this corpus must yield non-empty results under the default
    # config, otherwise the comparison is vacuous
    assert any(oracle.search(text, qcfg) for _, text in queries)
    run_and_compare(spark, store, oracle, queries, qcfg)


@pytest.mark.parametrize(
    "eager_min,agg_max",
    [(0, 32), (1_000_000, 32), (0, 0), (1_000_000, 0)],
    ids=["eager_latency", "lazy_latency", "eager_batch", "lazy_batch"],
)
def test_pruned_equals_unpruned(spark, engine, eager_min, agg_max):
    # agg_max=0 forces the BATCH path (per-posting decode -> JVM hash agg
    # -> theta filter -> top-k window) even for this small query set, so
    # the driver-side theta bound applied after the aggregation is
    # exercised against the exhaustive plan too
    store, oracle = engine
    queries = make_queries(oracle, n_per_bucket=2, seed=7)
    a = (
        search(spark, store, queries,
               QueryConfig(k=20, prune=True, prune_min_postings=0, prune_min_buckets=0,
                           prune_eager_min_queries=eager_min,
                           agg_in_decode_max_queries=agg_max))
        .orderBy("qid", "rank").toPandas()
    )
    b = (
        search(spark, store, queries, QueryConfig(k=20, prune=False))
        .orderBy("qid", "rank").toPandas()
    )
    assert list(a["qid"]) == list(b["qid"])
    assert list(a["docid"]) == list(b["docid"])
    for x, y in zip(a["score"], b["score"]):
        assert x == pytest.approx(y, abs=1e-9)


def test_low_idf_drop(spark, engine):
    store, oracle = engine
    # find a term with collection frequency > N, if the corpus has one
    hot = [t for t in oracle.postings if oracle.tf_collection(t) > oracle.num_docs]
    if not hot:
        pytest.skip("corpus has no low-idf term")
    q = [("h", hot[0])]
    got = search(spark, store, q, QueryConfig(k=10, ignore_low_idf=True)).count()
    assert got == 0
    got2 = search(spark, store, q, QueryConfig(k=10, ignore_low_idf=False)).count()
    assert got2 > 0


def test_oov_and_empty_queries(spark, engine):
    store, oracle = engine
    out = search(spark, store, [("a", "zzqqoovvx"), ("b", "the of and")],
                 QueryConfig(k=5))
    assert out.count() == 0


def test_k_limits_results(spark, engine):
    store, oracle = engine
    vocab = sorted(oracle.postings)
    q = [("q", f"{vocab[0]} {vocab[1]}")]
    out = search(spark, store, q, QueryConfig(k=3, prune=False)).toPandas()
    assert len(out) <= 3
    assert list(out.sort_values("rank")["rank"]) == list(range(len(out)))


def test_chunked_batch_equals_unchunked(spark, engine):
    """Bounded-memory chunking (batch_max_score_cells) must be
    result-invariant: queries never interact in scoring, so splitting a
    batch into sequential jobs returns exactly the same rows."""
    store, oracle = engine
    queries = make_queries(oracle, n_per_bucket=2, seed=7)
    base = QueryConfig(k=20, ignore_low_idf=False)
    whole = {
        (r["qid"], r["rank"], r["docid"], round(r["score"], 9))
        for r in search(spark, store, queries, base).collect()
    }
    # force several chunks: cap of 1 cell puts every query in its own
    # chunk (single-query chunks may exceed the cap, recursion stops)
    chunked_cfg = replace(base, batch_max_score_cells=1.0)
    chunked = {
        (r["qid"], r["rank"], r["docid"], round(r["score"], 9))
        for r in search(spark, store, queries, chunked_cfg).collect()
    }
    assert whole == chunked and whole


def test_survivor_chunked_batch_equals_unchunked(spark, engine):
    """The prunable over-cap path prunes ONCE batch-wide and chunks by
    surviving cell volume, each chunk reusing its survivor slice — must
    be result-invariant vs the unchunked plan.  Cap chosen so the
    pass-1 guard (queries x bucket_span <= cap) passes but the raw
    volume exceeds it, forcing the survivor-sized split."""
    store, oracle = engine
    queries = make_queries(oracle, n_per_bucket=2, seed=11)
    base = QueryConfig(k=20, ignore_low_idf=False, prune_min_postings=0)
    whole = {
        (r["qid"], r["rank"], r["docid"], round(r["score"], 9))
        for r in search(spark, store, queries, base).collect()
    }
    n_q = len(queries)
    cap = float(n_q * 128)  # engine fixture builds with bucket_span=128
    surv_cfg = replace(base, batch_max_score_cells=cap)
    chunked = {
        (r["qid"], r["rank"], r["docid"], round(r["score"], 9))
        for r in search(spark, store, queries, surv_cfg).collect()
    }
    assert whole == chunked and whole


def test_scan_pushdown_plan_shape(spark, engine):
    """Scale guard: the postings scan must keep the term In-filter
    pushed to parquet and read only the columns the plan needs — a scan
    that reads all columns for the decode would be wrong at 100 TB."""
    import contextlib
    import io

    store, oracle = engine
    vocab = sorted(oracle.postings)
    res = search(spark, store, [("q", f"{vocab[0]} {vocab[1]}")],
                 QueryConfig(k=5, ignore_low_idf=False))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    assert "In(term" in plan or "term IN" in plan, "term filter not pushed"
    import re
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    post_schema = next((s for s in schemas if "block" in s), None)
    assert post_schema is not None, f"no postings ReadSchema in plan: {schemas}"
    cols = {c.split(":")[0] for c in post_schema.split(",")}
    assert "content" not in cols and "pos" not in cols, cols
    assert cols <= {"term", "bucket", "block", "max_tf", "min_dl",
                    "max_score", "n", "ftf", "fln", "max_ftf_f",
                    "min_fln_f"}, f"over-wide postings scan: {cols}"


def test_session_tuning_check(spark, caplog):
    """The once-per-app session-tuning probe: a tuned session (the test
    fixture uses get_spark) reports nothing missing; a session missing
    the Arrow/AQE confs is flagged exactly once per applicationId."""
    import logging

    import importlib

    # the package attribute `search` is the function (re-exported by
    # query/__init__), which shadows `import ... as` binding; fetch the
    # MODULE from the import system instead
    search_mod = importlib.import_module("terrier_spark.query.search")

    search_mod._tuning_checked.discard(spark.sparkContext.applicationId)
    assert search_mod._check_session_tuning(spark) == []

    class FakeConf:
        def get(self, key, default=None):
            return "false"

    class FakeSC:
        applicationId = "fake-app-1"

    class FakeSpark:
        conf = FakeConf()
        sparkContext = FakeSC()

    search_mod._tuning_checked.discard("fake-app-1")
    with caplog.at_level(logging.WARNING, logger="terrier_spark.search"):
        missing = search_mod._check_session_tuning(FakeSpark())
    assert missing == [
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.adaptive.enabled",
    ]
    assert any("tuned settings" in r.message for r in caplog.records)
    # second call on the same app: memoized, silent, no list
    assert search_mod._check_session_tuning(FakeSpark()) == []
