"""Round-2 weighting models: hand value goldens for the 13 new scalar
models, DFR-framework composition identities (DFR(b,a,n) must reproduce
the dedicated classic models exactly), field-model kernels vs literal
per-posting ports, and engine rank identity for composed DFR names."""

import math

import numpy as np
import pytest

from terrier_spark.config import IndexConfig, QueryConfig
from terrier_spark.index.builder import build_index
from terrier_spark.index.corpus import synth_source_corpus
from terrier_spark.oracle import OracleFieldIndex, OracleIndex
from terrier_spark.query.models import (
    DFR_AFTER_EFFECTS,
    DFR_BASIC_MODELS,
    DFR_NORMALISATIONS,
    MODELS,
    get_model,
    ml2,
    mdl2,
    pl2f,
    score_scalar,
)
from terrier_spark.query.search import search

TF, DL, QTF, NT, FC = 3.0, 100.0, 1.0, 50, 200
N, AVGDL, T = 1000, 80.0, 80000
LOG2E = 1.0 / math.log(2.0)


def log2(x):
    return math.log(x) / math.log(2.0)


def stirling(n, m):
    return (m + 0.5) * log2(n / m) + (n - m) * log2(n)


def test_lemur_tf_idf_golden():
    rob = 1.2 * TF / (TF + 1.2 * (1 - 0.75 + 0.75 * DL / AVGDL))
    exp = QTF * rob * log2(N / NT) ** 2
    assert score_scalar("LemurTF_IDF", TF, DL, QTF, NT, FC, N, AVGDL, T) == \
        pytest.approx(exp, rel=1e-12)


def test_bb2_golden():
    TFn = TF * log2(1 + AVGDL / DL)
    NORM = (FC + 1) / (NT * (TFn + 1))
    exp = NORM * QTF * (
        -log2(N - 1) - LOG2E
        + stirling(N + FC - 1.0, N + FC - TFn - 2.0)
        - stirling(FC, FC - TFn)
    )
    assert score_scalar("BB2", TF, DL, QTF, NT, FC, N, AVGDL, T) == \
        pytest.approx(exp, rel=1e-12)


def test_dfr_bm25_golden():
    TFn = TF * log2(1 + AVGDL / DL)
    exp = ((1000 + 1) * QTF / (1000 + QTF)) * (1 / (TFn + 1.2)) * TFn * log2(
        (N - NT + 0.5) / (NT + 0.5)
    )
    assert score_scalar("DFR_BM25", TF, DL, QTF, NT, FC, N, AVGDL, T) == \
        pytest.approx(exp, rel=1e-12)


def test_dfree_golden():
    prior, post = TF / DL, (TF + 1) / (DL + 1)
    ipc = T / FC
    norm = TF * log2(post / prior)
    exp = QTF * norm * (
        TF * (-log2(prior * ipc))
        + (TF + 1) * log2(post * ipc)
        + 0.5 * log2(post / prior)
    )
    assert score_scalar("DFRee", TF, DL, QTF, NT, FC, N, AVGDL, T) == \
        pytest.approx(exp, rel=1e-12)


def test_dfree_klim_golden():
    p1, p2, cp = TF / DL, (TF + 1) / (DL + 1), FC / T
    exp = QTF * TF * log2(p2 / p1) * log2(p1 / cp)
    assert score_scalar("DFReeKLIM", TF, DL, QTF, NT, FC, N, AVGDL, T) == \
        pytest.approx(exp, rel=1e-12)


def test_dfic_dfiz_golden():
    e = FC * DL / T  # 0.25 < TF -> scores
    assert score_scalar("DFIC", TF, DL, QTF, NT, FC, N, AVGDL, T) == \
        pytest.approx(QTF * log2((TF - e) ** 2 / e + 1), rel=1e-12)
    assert score_scalar("DFIZ", TF, DL, QTF, NT, FC, N, AVGDL, T) == \
        pytest.approx(QTF * log2((TF - e) / math.sqrt(e) + 1), rel=1e-12)
    # below expectation -> 0 (DFIC.java "Condition 1")
    assert score_scalar("DFIC", 0.1, DL, QTF, NT, FC, N, AVGDL, T) == 0.0
    assert score_scalar("DFIZ", 0.1, DL, QTF, NT, FC, N, AVGDL, T) == 0.0


def test_js_kls_golden():
    mle, sp, cp = TF / DL, (TF + 1) / (DL + 1), FC / T
    js = (DL / (DL + 1)) * (1 - mle) * log2((TF + 1) / TF)
    kls = log2(sp / cp) + TF * log2(1 + 1 / TF)
    assert score_scalar("Js_KLs", TF, DL, QTF, NT, FC, N, AVGDL, T) == \
        pytest.approx(QTF * TF * js * kls, rel=1e-12)


def test_xsqra_m_golden():
    mle, sp, cp = TF / DL, (TF + 1) / (DL + 1), FC / T
    xs = (1 - mle) ** 2 / (TF + 1)
    delta = (TF + 1) * log2(sp / cp) - TF * log2(mle / cp) + 0.5 * log2(sp / mle)
    assert score_scalar("XSqrA_M", TF, DL, QTF, NT, FC, N, AVGDL, T) == \
        pytest.approx(QTF * TF * xs * delta, rel=1e-12)


def test_in_expc2_golden():
    # In_expC2 uses the NATURAL log for tf normalisation (In_expC2.java)
    TFn = TF * math.log(1 + AVGDL / DL)
    NORM = (FC + 1) / (NT * (TFn + 1))
    f = FC / N
    n_exp = N * (1 - math.exp(-f))
    exp = TFn * log2((N + 1) / (n_exp + 0.5)) * QTF * NORM
    assert score_scalar("In_expC2", TF, DL, QTF, NT, FC, N, AVGDL, T) == \
        pytest.approx(exp, rel=1e-12)


def test_inb2_golden():
    TFn = TF * log2(1 + AVGDL / DL)
    NORM = (FC + 1) / (NT * (TFn + 1))
    exp = TFn * QTF * log2((N + 1) / (NT + 0.5)) * NORM
    assert score_scalar("InB2", TF, DL, QTF, NT, FC, N, AVGDL, T) == \
        pytest.approx(exp, rel=1e-12)


def test_dl_tf_golden():
    assert score_scalar("Dl", TF, DL, QTF, NT, FC, N, AVGDL, T) == DL
    assert score_scalar("Tf", TF, DL, QTF, NT, FC, N, AVGDL, T) == TF


# ---------------------------------------------------------------- DFR frame

DFR_IDENTITIES = [
    ("DFR(In,L,2)", "InL2"),
    ("DFR(In_exp,B,2)", "In_expB2"),
    ("DFR(P,L,2)", "PL2"),
    ("DFR(IF,B,2)", "IFB2"),
    ("DFR(B,B,2)", "BB2"),
    ("DFR(In,B,2)", "InB2"),
    ("DFR(DFR_BM,,2)", "DFR_BM25"),
]


@pytest.mark.parametrize("dfr_name,classic", DFR_IDENTITIES)
def test_dfr_composition_identity(dfr_name, classic):
    """The composed DFR(b,a,n) kernel must equal the dedicated classic
    model bit-for-bit across a grid of statistics."""
    for tf in (1.0, 2.0, 7.0):
        for dl in (20.0, 80.0, 400.0):
            for nt, fc in ((5, 9), (50, 200), (400, 2500)):
                a = score_scalar(dfr_name, tf, dl, 2.0, nt, fc, N, AVGDL, T)
                b = score_scalar(classic, tf, dl, 2.0, nt, fc, N, AVGDL, T)
                # both NaN is fine: stirlingPower of a negative argument
                # (tfn > F on short docs) is NaN in the reference too
                assert a == pytest.approx(b, rel=1e-12, abs=1e-12,
                                          nan_ok=True), (
                    dfr_name, tf, dl, nt, fc)


def test_dfr_all_components_finite():
    """Every (basic, aftereffect, normalisation) combination must produce
    finite scores on benign statistics (smoke over the full grid)."""
    for b in DFR_BASIC_MODELS:
        for a in list(DFR_AFTER_EFFECTS) + [""]:
            for n in list(DFR_NORMALISATIONS) + [""]:
                name = f"DFR({b},{a},{n})"
                s = score_scalar(name, 3.0, 100.0, 1.0, 50, 200, N, AVGDL, T)
                assert math.isfinite(s), name


def test_dfr_parameter_and_unknown():
    # explicit c parameter changes the normalisation
    s1 = score_scalar("DFR(In,L,2)", TF, DL, QTF, NT, FC, N, AVGDL, T)
    s2 = score_scalar("DFR(In,L,2,5.0)", TF, DL, QTF, NT, FC, N, AVGDL, T)
    assert s1 != s2
    with pytest.raises(ValueError, match="DFR component"):
        get_model("DFR(Nope,L,2)")
    with pytest.raises(ValueError, match="unknown weighting model"):
        get_model("NotAModel")


# ---------------------------------------------------------------- field kernels


def _field_fixture():
    ftf = np.array([[2.0, 3.0], [0.0, 4.0], [1.0, 0.0]])
    fln = np.array([[4.0, 100.0], [6.0, 50.0], [3.0, 90.0]])
    avg = [5.0, 80.0]
    w, c = [1.0, 1.0], [1.0, 1.0]
    return ftf, fln, w, c, avg


def test_pl2f_kernel_golden():
    ftf, fln, w, c, avg = _field_fixture()
    got = pl2f(ftf, fln, 1.0, 50, 500, 1000, w, c, avg, 100_000)
    for i in range(3):
        tfn = sum(
            w[fi] * ftf[i, fi] * log2(1 + c[fi] * avg[fi] / fln[i, fi])
            for fi in range(2) if ftf[i, fi] > 0
        )
        f = 500 / 1000
        exp = (1 / (tfn + 1)) * (
            tfn * log2(1 / f) + f * LOG2E + 0.5 * log2(2 * math.pi * tfn)
            + tfn * (log2(tfn) - LOG2E)
        )
        assert float(got[i]) == pytest.approx(exp, rel=1e-12)


def test_ml2_mdl2_vs_literal_port(spark):
    """Vectorized ML2/MDL2 kernels vs the literal per-posting Java ports
    in OracleFieldIndex.search_field_model, end to end through the
    engine."""
    corpus = synth_source_corpus(spark, n_docs=200)
    pdf = corpus.toPandas()
    cfg = IndexConfig(field_cols=(("path", "path"), ("content", "content")))
    import tempfile

    out = tempfile.mkdtemp()
    store = build_index(spark, corpus, out, cfg, bucket_span=64)
    oracle = OracleFieldIndex(list(zip(pdf["path"], pdf["content"])),
                              cfg.pipeline)
    queries = [("q1", "sym1 py sym7"), ("q2", "src sym0 class")]
    for model in ("PL2F", "ML2", "MDL2"):
        qcfg = QueryConfig(k=20, model=model, ignore_low_idf=False)
        got = search(spark, store, queries, qcfg).orderBy(
            "qid", "rank").toPandas()
        by_qid = {qid: grp for qid, grp in got.groupby("qid")}
        nonempty = 0
        for qid, text in queries:
            exp = oracle.search_field_model(text, model, k=20)
            grp = by_qid.get(qid)
            act = list(zip(grp["docid"], grp["score"])) if grp is not None else []
            assert len(act) == len(exp), f"{model} {qid}"
            nonempty += bool(exp)
            for (gd, gs), (ed, es) in zip(act, exp):
                assert gd == ed, f"{model} {qid}: {gd} != {ed}"
                if not (math.isnan(gs) and math.isnan(es)):
                    assert gs == pytest.approx(es, abs=1e-6), (model, qid, gd)
        assert nonempty > 0, model


def test_dfr_rank_identity_engine(spark):
    """Composed DFR model names work end to end through search()."""
    corpus = synth_source_corpus(spark, n_docs=150)
    import tempfile

    out = tempfile.mkdtemp()
    store = build_index(spark, corpus, out, bucket_span=64)
    oracle = OracleIndex(corpus.toPandas()["content"].tolist(),
                         IndexConfig().pipeline)
    for model in ("DFR(In_exp,L,2)", "DFR(P,B,1)", "DFR(BM,,B)"):
        qcfg = QueryConfig(k=15, model=model)
        got = search(spark, store, [("q", "sym1 sym4 class")], qcfg) \
            .orderBy("rank").toPandas()
        exp = oracle.search("sym1 sym4 class", qcfg)
        assert list(got["docid"]) == [d for d, _ in exp], model
        for g, (_, s) in zip(got["score"], exp):
            assert g == pytest.approx(s, abs=1e-6), model


def test_per_field_composition_identity():
    """PerField(BM,B) must equal BM25F and PerField(PL,2) must equal PL2F
    on a posting grid (PerFieldNormWeightingModel is the framework both
    derive from)."""
    from terrier_spark.query.models import bm25f, get_model, pl2f

    ftf, fln, w, c, avg = _field_fixture()
    args = (1.0, 50, 500, 1000, w, c, avg, 100_000)
    got_bm = get_model("PerField(BM,B)").kernel(ftf, fln, *args)
    exp_bm = bm25f(ftf, fln, *args)
    got_pl = get_model("PerField(PL,2)").kernel(ftf, fln, *args)
    exp_pl = pl2f(ftf, fln, *args)
    for g, e in zip(got_bm, exp_bm):
        assert float(g) == pytest.approx(float(e), rel=1e-12)
    for g, e in zip(got_pl, exp_pl):
        assert float(g) == pytest.approx(float(e), rel=1e-12)
    with pytest.raises(ValueError, match="PerField component"):
        get_model("PerField(Nope,2)")
