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


# ---------------------------------------------------------------------------
# Expanded per-class goldens (round 4).  Derived by hand-tracing the
# published algorithm's suffix grammar: every suffix vowel harmonises
# with the nearest vowel to its left; buffer validity is two-sided
# (y/n/s present only after vowel-final stems, absent only after
# consonant-final stems; the U connector the other way around), and
# buffered forms bind tighter than bare forms (arabası = araba+sı,
# never arabas+ı; okula = okul+a, never oku+la).  Where agglutinative
# suffix stripping is genuinely ambiguous the algorithm's parse is
# recorded with the ambiguity in the comment.
TR_GOLDENS_CLASSES = {
    # nominal-verb layer (copulas etc.)
    "doktordur": "doktor", "doktormuş": "doktor", "çocukken": "çocuk",
    "güzeldi": "güzel", "güzelse": "güzel",
    # ambiguous: öğretmen-im "I am a teacher" strips Um, then the
    # possessive parse öğretme-n ("your training") strips n — both
    # rule-valid
    "öğretmenim": "öğretme",
    # case endings (with harmony)
    "evden": "ev", "okuldan": "okul", "evde": "ev", "okulda": "okul",
    "evin": "ev", "okulun": "okul", "arabayla": "araba",
    "trenle": "tren", "evi": "ev", "okulu": "okul", "eve": "ev",
    "okula": "okul", "evince": "ev",
    # -ki chain re-opens case stripping
    "evdeki": "ev", "okuldaki": "okul", "evindeki": "ev",
    # possessives (buffer U after consonants, s after vowels)
    "evim": "ev", "evimiz": "ev", "eviniz": "ev", "okulumuz": "okul",
    "arabası": "araba", "annesi": "anne", "babam": "baba",
    "baban": "baba", "kitabım": "kitap",
    # plural and chains (case -> possessive -> plural, outside-in)
    "evler": "ev", "okullar": "okul", "kitaplar": "kitap",
    "evlerden": "ev", "evlerinden": "ev", "evleri": "ev",
    "arabalarında": "araba", "arabasında": "araba",
    "kitaplarımız": "kitap", "okullarımızdan": "okul",
    "arabalarıyla": "araba", "kitapları": "kitap", "evlerde": "ev",
    "sınıfında": "sınıf",
    # final-stop devoicing restored after stripping
    "kitabı": "kitap", "ağacı": "ağaç", "köpeği": "köpek",
    # harmony holds across rounded/unrounded and front/back
    "gözden": "göz", "gülü": "gül", "gülden": "gül",
    # apostrophe clitics dropped before stemming
    "İstanbul'da": "İstanbul",
    # ambiguous: Ankara -> dative parse Ankar+a is rule-valid
    "Ankara'nın": "Ankar",
    # single-syllable words untouched
    "ev": "ev", "göz": "göz", "at": "at",
}


def test_snowball_tr_goldens_per_class():
    wrong = {
        w: (snowball_tr_stem(w), want)
        for w, want in TR_GOLDENS_CLASSES.items()
        if snowball_tr_stem(w) != want
    }
    assert not wrong, f"mismatches (got, want): {wrong}"
    assert len(TR_GOLDENS_CLASSES) >= 50


def test_tr_buffer_two_sided():
    # bare lA must not strip from a vowel-final stem (okul+a dative,
    # not oku+la instrumental) ...
    assert snowball_tr_stem("okula") == "okul"
    # ... and buffered sU binds tighter than bare accusative U
    assert snowball_tr_stem("arabası") == "araba"
