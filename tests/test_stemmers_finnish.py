"""Finnish Snowball stemmer — goldens hand-traced against the published
algorithm description (classic revision).  Reference surface:
org/terrier/terms/FinnishSnowballStemmer.java (thin wrapper over the
public Snowball program)."""

from terrier_spark.config import PipelineConfig
from terrier_spark.text.pipeline import STEMMERS, resolve_stemmer
from terrier_spark.text.snowball_finnish import snowball_fi_stem

FI_GOLDENS = {
    "taloissa": "talo",     # step3 ssa, step5 plural i
    "taloihin": "talo",     # step3 hin after i, step5 plural i
    "taloko": "talo",       # step1 particle ko after vowel
    "kirja": "kirj",        # step6b consonant+a in R1
    "kirjojen": "kirj",     # step3 n, step6 b/c/d cascade
    "suurimmat": "suurim",  # step5 t, step6b, step6e undouble mm
    "tyttö": "tytö",        # step6e double consonant + trailing vowel
    "talo": "talo",
}


def test_snowball_fi_goldens():
    for word, want in FI_GOLDENS.items():
        assert snowball_fi_stem(word) == want, word


def test_fi_registry_wiring():
    assert "snowball_fi" in STEMMERS
    assert callable(resolve_stemmer(PipelineConfig(stemmer="snowball_fi")))


def test_fi_short_words_untouched():
    for w in ("a", "ja", ""):
        assert snowball_fi_stem(w) == w, w
