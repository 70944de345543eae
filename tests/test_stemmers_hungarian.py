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


# ---------------------------------------------------------------------------
# Expanded per-step goldens (round 4).  Each output was derived by
# hand-tracing the published algorithm (snowballstem.org/algorithms/
# hungarian/stemmer.html): all nine steps run in sequence, each taking
# the longest matching suffix of ITS table inside R1, so cascades like
# szobában -> (step2 ban, unlengthen) szoba -> (step7 owner a) szob are
# prescribed behavior, and step 4's stul/stül entries are shadowed by
# step 2's earlier ul/ül (családostul -> családost), exactly as in the
# published step ordering.
HU_GOLDENS_STEPS = {
    # step 1: instrumental al/el after a double consonant (+ undouble,
    # incl. digraph doubles ggy->gy, ssz->sz)
    "vassal": "vas", "vízzel": "víz", "könyvvel": "könyv",
    "busszal": "busz", "meggyel": "megy",
    # step 2: frequent cases (delete + unlengthen final á/é)
    "házban": "ház", "házba": "ház", "házra": "ház", "háznak": "ház",
    "háztól": "ház", "házról": "ház", "házból": "ház", "házhoz": "ház",
    "háznál": "ház", "házig": "ház", "házért": "ház", "házzá": "ház",
    "házon": "ház", "kertben": "kert", "kertnek": "kert",
    "kertnél": "kert", "kerthez": "kert", "tűzhöz": "tűz",
    "fában": "fa", "percenként": "perc", "naponként": "nap",
    "fejenként": "fej",
    # step 2 + later owner/plural cascade (all steps run in sequence)
    "szobában": "szob", "mesében": "mes", "órakor": "ór",
    # step 2 shadowing step 4 (ul before stul in the step order)
    "családostul": "családost", "ruhástul": "ruhást",
    "mindenestül": "mindenest",
    # step 3: special cases án/én -> a/e (then the owner cascade)
    "lován": "lov", "kezén": "kez",
    # step 6: owned ké/éi (áké -> a, then owner-a cascade)
    "apáké": "ap", "anyáké": "any", "gyereké": "gyer", "gyerekéi": "gyer",
    # step 7: singular owner
    "házam": "ház", "házad": "ház", "házunk": "ház", "házuk": "ház",
    "kertem": "kert", "kertje": "kert", "barátja": "barát",
    "autója": "autó", "almám": "alma", "almád": "alma", "almánk": "alma",
    "kezem": "kez",
    # step 8: plural owner
    "házaim": "ház", "házaid": "ház", "házai": "ház", "házaink": "ház",
    "házaitok": "ház", "házaik": "ház", "kertjeim": "kert",
    "almáim": "alma",
    # step 9: plural (ák/ék -> a/e, others delete)
    "házak": "ház", "kertek": "kert", "tükrök": "tükr", "autók": "autó",
    "emberek": "ember", "könyvek": "könyv", "asztalok": "asztal",
    # R1 gating: suffix not entirely inside R1 -> untouched
    "jól": "jól",
}


def test_snowball_hu_goldens_per_step():
    wrong = {
        w: (snowball_hu_stem(w), want)
        for w, want in HU_GOLDENS_STEPS.items()
        if snowball_hu_stem(w) != want
    }
    assert not wrong, f"mismatches (got, want): {wrong}"
    assert len(HU_GOLDENS_STEPS) >= 50
