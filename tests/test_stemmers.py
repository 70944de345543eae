"""Stemmer variants: WeakPorter (classic step 1 only), TRv2 Porter
(Amati's Terrier-v2 variant incl. its departures), TRv2 weak, and the
English Snowball (Porter2) — goldens hand-traced against the published
algorithms / reference Java."""

import pytest

from terrier_spark.config import IndexConfig, PipelineConfig
from terrier_spark.text.pipeline import STEMMERS, make_pipeline, resolve_stemmer
from terrier_spark.text.porter import (
    porter_stem,
    trv2_porter_stem,
    trv2_weak_porter_stem,
    weak_porter_stem,
)
from terrier_spark.text.snowball import snowball_en_stem

WEAK_GOLDENS = {
    # WeakPorterStemmer.java: classic step1 (plurals + ed/ing) ONLY
    "caresses": "caress", "ponies": "poni", "cats": "cat",
    "agreed": "agree",        # eed -> ee, later steps skipped
    "troubling": "trouble",   # ing dropped, bl -> ble
    "adoption": "adoption",   # step5 never runs
    "relational": "relational",
    "hopping": "hop",
    "sky": "sky",
}

TRV2_GOLDENS = {
    # TRv2PorterStemmer.java departures, hand-traced
    "gas": "gas",            # bare-s removal requires k > 2 (classic: ga)
    "cats": "cat",
    "ties": "ti",
    "ies": "ies",            # ies replacement requires k > 2
    "adoption": "adop",      # 'tion' matched whole (classic: adopt)
    "television": "televi",  # 'sion' matched whole (classic: televis)
    "decision": "decision",  # m() == 1 after whole-'sion' match -> kept
    "caresses": "caress",
    "motoring": "motor",
    "conflated": "conflat",
    "relational": "relat",
    "conditional": "condition",  # m() == 1 after whole-'tion' match
}

SNOWBALL_GOLDENS = {
    # exceptional forms (spec exception lists)
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "bias": "bias",
    "inning": "inning", "proceed": "proceed", "exceed": "exceed",
    # step 1a
    "caresses": "caress", "ties": "tie", "cries": "cri",
    "gaps": "gap", "gas": "gas", "kiwis": "kiwi",
    # step 1b (+ post-rules)
    "agreed": "agre", "running": "run", "hopping": "hop",
    "filing": "file", "falling": "fall",
    # R1-prefix exceptions + steps 2-5
    "generously": "generous", "communication": "communic",
    "conditional": "condit", "rational": "ration",
    "adoption": "adopt", "national": "nation",
    # y handling
    "cry": "cri", "by": "by", "say": "say",
}


def test_weak_porter_goldens():
    for w, s in WEAK_GOLDENS.items():
        assert weak_porter_stem(w) == s, w


def test_trv2_goldens():
    for w, s in TRV2_GOLDENS.items():
        assert trv2_porter_stem(w) == s, w


def test_trv2_weak_is_step1_only():
    assert trv2_weak_porter_stem("agreed") == "agree"
    assert trv2_weak_porter_stem("relational") == "relational"
    assert trv2_weak_porter_stem("gas") == "gas"
    # step1c included: terminal y -> i when a vowel precedes in the stem
    assert trv2_weak_porter_stem("happy") == "happi"


def test_snowball_goldens():
    for w, s in SNOWBALL_GOLDENS.items():
        assert snowball_en_stem(w) == s, (w, snowball_en_stem(w))


def test_snowball_differs_from_porter_where_expected():
    # ties: Porter1 -> ti, Porter2 -> tie
    assert porter_stem("ties") == "ti"
    assert snowball_en_stem("ties") == "tie"


def test_registry_and_pipeline_wiring():
    assert set(STEMMERS) == {
        "porter", "weak_porter", "trv2_porter", "trv2_weak_porter",
        "snowball_en",
    }
    assert resolve_stemmer(PipelineConfig(stem=False)) is None
    assert resolve_stemmer(PipelineConfig()) is porter_stem
    with pytest.raises(ValueError, match="unknown stemmer"):
        resolve_stemmer(PipelineConfig(stemmer="nope"))
    pipe = make_pipeline(PipelineConfig(stemmer="snowball_en"))
    assert pipe.terms("running ties skies") == ["run", "tie", "sky"]
    pipe2 = make_pipeline(PipelineConfig(stemmer="trv2_porter"))
    assert pipe2.terms("adoption gas") == ["adop", "gas"]


def test_stemmer_config_survives_manifest_roundtrip(spark, tmp_path):
    """An index built with a non-default stemmer must apply the SAME
    stemmer to queries loaded from its manifest."""
    from terrier_spark.config import QueryConfig
    from terrier_spark.index.builder import build_index
    from terrier_spark.index.corpus import synth_source_corpus
    from terrier_spark.index.store import IndexStore
    from terrier_spark.query.search import search

    corpus = synth_source_corpus(spark, n_docs=80)
    cfg = IndexConfig(
        pipeline=PipelineConfig(stemmer="snowball_en")
    )
    build_index(spark, corpus, str(tmp_path / "sb"), cfg, bucket_span=64)
    store = IndexStore(str(tmp_path / "sb"))
    assert store.pipeline_config().stemmer == "snowball_en"
    res = search(spark, store, [("q", "sym1 sym3")],
                 QueryConfig(k=5, ignore_low_idf=False))
    assert res.count() == 5


def test_tokeniser_variants():
    from terrier_spark.text.tokenizer import tokenize

    utf = PipelineConfig(tokeniser="utf")
    en = PipelineConfig()
    ident = PipelineConfig(tokeniser="identity")
    text = "café münchen test123 Ελληνικά x_y"
    assert tokenize(text, en) == ["caf", "m", "nchen", "test123", "x", "y"]
    assert tokenize(text, utf) == [
        "café", "münchen", "test123", "ελληνικά", "x", "y"
    ]
    # identity: whole input, lowercased, unchecked
    assert tokenize("One Two", ident) == ["one two"]
    # validity rules still apply to UTF tokens
    assert tokenize("aaaab 12345x", utf) == []
    with pytest.raises(ValueError, match="unknown tokeniser"):
        tokenize("x", PipelineConfig(tokeniser="nope"))
