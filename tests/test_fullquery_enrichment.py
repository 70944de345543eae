"""AdhocFullQueryEvaluation (per-query eval, trec_eval -q analog) and
the CollectionEnrichment getExpansionTerms convenience surface."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

from terrier_spark.query.evaluation import (
    evaluate_full_query,
    normalize_trec_qid,
)
from terrier_spark.query.expansion import (
    get_expansion_terms,
    normalise_enrichment_query,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _results():
    # q1: 4 results, rel = {d1, d3}: hits at ranks 1 and 3
    # q2: 3 results, rel = {d9}: hit at rank 2
    # q3: unjudged -> skipped
    rows = [
        ("WT-1", 0, "d1"), ("WT-1", 1, "d2"), ("WT-1", 2, "d3"),
        ("WT-1", 3, "d4"),
        ("topic2", 0, "d8"), ("topic2", 1, "d9"), ("topic2", 2, "d0"),
        ("3", 0, "dx"),
    ]
    return pd.DataFrame(rows, columns=["qid", "rank", "docno"])


def test_normalize_trec_qid():
    assert normalize_trec_qid("WT04-065") == "04065"
    assert normalize_trec_qid("451") == "451"
    assert normalize_trec_qid("q-") == ""


def test_full_query_eval_goldens():
    qrels = {"1": {"d1", "d3"}, "2": {"d9"}}
    out = evaluate_full_query(_results(), qrels)
    pq = out["per_query"]
    # q3 unjudged -> skipped entirely
    assert set(pq) == {"1", "2"}
    # q1 (normalised from WT-1): AP = (1/1 + 2/3) / 2 = 5/6
    assert pq["1"]["AP"] == pytest.approx(5 / 6)
    # R = 2 relevant, top-2 has 1 hit -> R-prec 0.5
    assert pq["1"]["R_precision"] == pytest.approx(0.5)
    assert pq["1"]["num_relevant"] == 2
    assert pq["1"]["num_retrieved"] == 4
    assert pq["1"]["num_relevant_retrieved"] == 2
    assert pq["1"]["P_at"][1] == pytest.approx(1.0)
    assert pq["1"]["P_at"][2] == pytest.approx(0.5)
    # q2 (normalised from topic2): AP = (1/2) / 1 = 0.5
    assert pq["2"]["AP"] == pytest.approx(0.5)
    assert pq["2"]["R_precision"] == pytest.approx(0.0)
    # aggregate over the two judged queries
    assert out["aggregate"]["MAP"] == pytest.approx((5 / 6 + 0.5) / 2)
    assert out["aggregate"]["num_queries"] == 2


def test_full_query_eval_empty():
    out = evaluate_full_query(_results(), {"999": {"dz"}})
    assert out["per_query"] == {}
    assert out["aggregate"]["num_queries"] == 0


def test_cli_eval_full(tmp_path):
    run = tmp_path / "run.txt"
    run.write_text(
        "1 Q0 d1 0 2.0 t\n1 Q0 d2 1 1.5 t\n1 Q0 d3 2 1.0 t\n"
        "2 Q0 d8 0 2.0 t\n2 Q0 d9 1 1.9 t\n"
    )
    qrels = tmp_path / "qrels.txt"
    qrels.write_text("1 0 d1 1\n1 0 d3 2\n2 0 d9 1\n")
    proc = subprocess.run(
        [sys.executable, "-m", "terrier_spark", "eval",
         "--run", str(run), "--qrels", str(qrels), "--measure", "full"],
        capture_output=True, text=True, cwd=REPO,
        env=dict(os.environ, PYTHONPATH=REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout)
    assert out["per_query"]["1"]["AP"] == pytest.approx(
        (1 / 1 + 2 / 3) / 2)
    assert out["per_query"]["2"]["AP"] == pytest.approx(0.5)
    assert out["aggregate"]["MAP"] == pytest.approx((5 / 6 + 0.5) / 2)


def test_normalise_enrichment_query():
    assert normalise_enrichment_query('Foo (BAR) "baz"') == "foo bar baz"
    assert normalise_enrichment_query("cats and dogs") == "cats dogs"
    assert normalise_enrichment_query("title:spark body:join") == (
        "spark join"
    )
    assert normalise_enrichment_query("+required trailing:") == (
        "required trailing"
    )


def test_get_expansion_terms_matches_prf(spark, tmp_path_factory):
    from terrier_spark.config import IndexConfig, QueryConfig
    from terrier_spark.index.builder import build_index
    from terrier_spark.index.corpus import synth_source_corpus
    from terrier_spark.query.expansion import expand_queries

    out = str(tmp_path_factory.mktemp("ceidx"))
    corpus = synth_source_corpus(spark, n_docs=200)
    store = build_index(spark, corpus, out, IndexConfig(), bucket_span=128)

    query = "sym1 sym2"
    terms = get_expansion_terms(spark, store, query, n_docs=3, n_terms=5)
    assert terms and all("^" in t for t in terms)
    # must agree with the underlying PRF path on the same parameters
    exp = expand_queries(spark, store, [("ce", query)], QueryConfig(),
                         fb_docs=3, fb_terms=5, qe_model="Bo1")
    exp_terms = {r.term: r.qtf for r in exp.itertuples()}
    got = {t.split("^")[0]: float(t.split("^")[1]) for t in terms}
    assert set(got) == set(exp_terms)
    for t, w in got.items():
        assert w == pytest.approx(exp_terms[t], abs=1e-8)
    # weight-descending order
    ws = [float(t.split("^")[1]) for t in terms]
    assert ws == sorted(ws, reverse=True)
