"""Danish / Norwegian / Swedish Snowball stemmers — goldens hand-traced
against the published algorithm descriptions (classic revisions).
Reference surface: org/terrier/terms/{Danish,Norwegian,Swedish}
SnowballStemmer.java (thin wrappers over the public Snowball programs).
"""

from terrier_spark.config import PipelineConfig
from terrier_spark.text.pipeline import STEMMERS, resolve_stemmer
from terrier_spark.text.snowball_nordic import (
    snowball_da_stem,
    snowball_no_stem,
    snowball_sv_stem,
)

DA_GOLDENS = {
    "indtagelse": "indtag",    # step1 e, step3 els
    "hallen": "hal",           # step1 en, step4 undouble ll
    "katte": "kat",            # step1 e, step4 undouble tt
    "vaskes": "vask",          # step1 es (longest in R1 beats s)
    "dags": "dag",             # s after valid s-ending g
    "løst": "løst",            # løst not inside R1 -> untouched
    "afgørelser": "afgør",     # step1 er, step3 els
    "venligst": "ven",         # igst pre-rule, then step3 lig
    "huset": "hus",            # step1 et
    "hus": "hus",
}

NO_GOLDENS = {
    "huset": "hus",            # step1 et
    "kastene": "kast",         # step1 ene
    "hetenes": "het",          # step1 enes (hetenes itself not in R1)
    "naturlig": "natur",       # step3 lig
    "husets": "hus",           # step1 ets
    "boks": "boks",            # s after k-after-vowel: invalid s-ending
    "kasserte": "kasser",      # erte -> er
    "fisk": "fisk",
}

SV_GOLDENS = {
    "klockorna": "klock",      # step1 orna
    "jakten": "jakt",          # step1 en
    "väsentligt": "väsent",    # step2 gt, step3 lig
    "flickornas": "flick",     # step1 ornas
    "möjlighetens": "möj",     # step1 hetens, step3 lig
    "dagars": "dagar",         # s after valid s-ending r
    "fullt": "fullt",          # fullt not inside R1 -> untouched
    "svensk": "svensk",
}


def test_snowball_da_goldens():
    for word, want in DA_GOLDENS.items():
        assert snowball_da_stem(word) == want, word


def test_snowball_no_goldens():
    for word, want in NO_GOLDENS.items():
        assert snowball_no_stem(word) == want, word


def test_snowball_sv_goldens():
    for word, want in SV_GOLDENS.items():
        assert snowball_sv_stem(word) == want, word


def test_nordic_registry_wiring():
    for name in ("snowball_da", "snowball_no", "snowball_sv"):
        assert name in STEMMERS
        fn = resolve_stemmer(PipelineConfig(stemmer=name))
        assert callable(fn)


def test_nordic_idempotent_on_goldens():
    for fn, goldens in ((snowball_da_stem, DA_GOLDENS),
                        (snowball_no_stem, NO_GOLDENS),
                        (snowball_sv_stem, SV_GOLDENS)):
        for stem in set(goldens.values()):
            assert fn(fn(stem)) == fn(stem), (fn.__name__, stem)


def test_nordic_short_words_untouched():
    for fn in (snowball_da_stem, snowball_no_stem, snowball_sv_stem):
        for w in ("a", "by", "tre", ""):
            assert fn(w) == w, (fn.__name__, w)


def test_all_stemmers_total_on_arbitrary_words():
    """Every registered stemmer is total: returns a str and never
    raises, on arbitrary unicode words (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from terrier_spark.text.pipeline import STEMMERS

    @given(st.text(min_size=0, max_size=40))
    @settings(max_examples=300, deadline=None)
    def check(word):
        for name, fn in STEMMERS.items():
            got = fn(word.lower())
            assert isinstance(got, str), (name, word)
            # a stemmer may rewrite letters but never grows a word by
            # more than a couple of replacement characters
            assert len(got) <= len(word) + 4, (name, word, got)

    check()
