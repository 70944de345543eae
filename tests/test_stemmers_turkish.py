"""Turkish Snowball stemmer — goldens hand-traced against the published
algorithm description (vowel harmony, buffer letters, devoicing).
Reference surface: org/terrier/terms/TurkishSnowballStemmer.java (thin
wrapper over the public Snowball program)."""

from terrier_spark.config import PipelineConfig
from terrier_spark.text.pipeline import STEMMERS, resolve_stemmer
from terrier_spark.text.snowball_turkish import snowball_tr_stem

TR_GOLDENS = {
    "evlerden": "ev",       # ablative DAn then plural lAr
    "kitapları": "kitap",   # 3pl possessive lArI (harmonised ı)
    "kitabı": "kitap",      # accusative U + final devoice b->p
    "evdeki": "ev",         # ki chain: ki then locative DA
    "ev": "ev",             # single syllable: untouched
    "okulumuz": "okul",     # 1pl possessive (U)mUz
    "arabalarında": "araba",  # nDA + lArI chain
}


def test_snowball_tr_goldens():
    for word, want in TR_GOLDENS.items():
        assert snowball_tr_stem(word) == want, word


def test_tr_vowel_harmony_blocks_mismatched_suffix():
    # 'den' after a back-vowel stem violates harmony: no strip of DAn
    assert not snowball_tr_stem("kapıdan").endswith("dan")
    # front-vowel stem + 'dan' likewise stays un-stripped as DAn
    assert snowball_tr_stem("evden") == "ev"


def test_tr_apostrophe_clitic():
    assert "'" not in snowball_tr_stem("Ankara'nın")


def test_tr_registry_wiring():
    assert "snowball_tr" in STEMMERS
    assert callable(resolve_stemmer(PipelineConfig(stemmer="snowball_tr")))
