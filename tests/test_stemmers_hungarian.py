"""Hungarian Snowball stemmer — goldens hand-traced against the
published algorithm description (classic revision).  Reference surface:
org/terrier/terms/HungarianSnowballStemmer.java (thin wrapper over the
public Snowball program)."""

from terrier_spark.config import PipelineConfig
from terrier_spark.text.pipeline import STEMMERS, resolve_stemmer
from terrier_spark.text.snowball_hungarian import _hu_r1, snowball_hu_stem

HU_GOLDENS = {
    "babák": "baba",       # step9 ák -> a
    "házakat": "ház",      # step2 at, step9 ak
    "tollal": "tol",       # step1 instrumental al + undouble ll
    # step2 ban + unlengthen á->a, then owner-a (step7) and plural-k
    # (step9) also fire — every step runs in sequence
    "munkában": "mun",
    "asztal": "asztal",    # vowel-start R1 after digraph sz; nothing fires
    "háza": "ház",         # step7 singular owner a
    "ház": "ház",
}


def test_snowball_hu_goldens():
    for word, want in HU_GOLDENS.items():
        assert snowball_hu_stem(word) == want, word


def test_hu_r1_definition():
    assert _hu_r1("asztal") == 3   # vowel start: after the sz digraph
    assert _hu_r1("ház") == 2      # consonant start: after first vowel
    assert _hu_r1("aaa") == 3      # no consonant: null region at end


def test_hu_registry_wiring():
    assert "snowball_hu" in STEMMERS
    assert callable(resolve_stemmer(PipelineConfig(stemmer="snowball_hu")))


def test_hu_short_words_untouched():
    for w in ("a", "az", ""):
        assert snowball_hu_stem(w) == w, w
