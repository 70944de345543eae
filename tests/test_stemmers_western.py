"""Dutch / Italian / Portuguese Snowball stemmers — goldens hand-traced
against the published algorithm descriptions (classic revisions).
Reference surface: org/terrier/terms/{Dutch,Italian,Portuguese}
SnowballStemmer.java (thin wrappers over the public Snowball programs).
"""

from terrier_spark.config import PipelineConfig
from terrier_spark.text.pipeline import STEMMERS, resolve_stemmer
from terrier_spark.text.snowball_western import (
    snowball_it_stem,
    snowball_nl_stem,
    snowball_pt_stem,
)

NL_GOLDENS = {
    "lichamelijk": "licham",        # 3b lijk + repeated step 2
    "lichamelijkheden": "licham",   # heden->heid, 3a heid, 3b lijk
    "opeenvolgende": "opeenvolg",   # step2 e, 3b end
    "beschikbaar": "beschik",       # 3b baar
    "openbare": "open",             # step2 e sets flag, 3b bar
    "katten": "kat",                # step1 en + undouble tt
    "haken": "hak",                 # step1 en
    "plaaten": "plat",              # step1 en, step4 vowel undouble
    "grote": "grot",                # step2 e
    "bokser": "bokser",             # no rule fires
}

IT_GOLDENS = {
    "abbandonata": "abbandon",      # step2 ata
    "cantando": "cant",             # step2 ando
    "mandarglielo": "mand",         # step0 pronoun after ar -> e, step2 are
    "felicità": "felic",            # step1 ità (ic NOT in R2)
    "generosamente": "gener",       # step1 amente + os in R2
    "crocchi": "crocc",             # 3a final i, 3b ch->c
    "soluzioni": "soluzion",        # uzioni not in R2; 3a final i
    "pranzo": "pranz",              # 3a final o
}

PT_GOLDENS = {
    "felicidade": "felic",          # step1 idade (ic NOT in R2)
    "cantando": "cant",             # step2 ando
    "falaremos": "fal",             # step2 aremos
    "gostaria": "gost",             # step2 aria
    "rapidamente": "rapid",         # step1 amente
    "grande": "grand",              # step5 final e
    "bonita": "bonit",              # steps 1-2 nothing, step4 final a
    "menos": "men",                 # step4 residual os
}


def test_snowball_nl_goldens():
    for word, want in NL_GOLDENS.items():
        assert snowball_nl_stem(word) == want, word


def test_snowball_it_goldens():
    for word, want in IT_GOLDENS.items():
        assert snowball_it_stem(word) == want, word


def test_snowball_pt_goldens():
    for word, want in PT_GOLDENS.items():
        assert snowball_pt_stem(word) == want, word


def test_western_registry_wiring():
    for name in ("snowball_nl", "snowball_it", "snowball_pt"):
        assert name in STEMMERS
        fn = resolve_stemmer(PipelineConfig(stemmer=name))
        assert callable(fn)


def test_western_short_words_untouched():
    for fn in (snowball_nl_stem, snowball_it_stem, snowball_pt_stem):
        for w in ("a", "il", ""):
            assert fn(w) == w, (fn.__name__, w)
