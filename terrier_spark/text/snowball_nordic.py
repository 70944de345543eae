"""Danish, Norwegian and Swedish Snowball stemmers, implemented from the
published algorithms (snowballstem.org/algorithms/{danish,norwegian,
swedish}/stemmer.html, classic revisions — the algorithms behind the
org.tartarus programs the reference wraps in DanishSnowballStemmer.java /
NorwegianSnowballStemmer.java / SwedishSnowballStemmer.java).

All three share the Scandinavian skeleton: a single R1 region whose
start is clamped so at least 3 letters precede it, a longest-match
suffix step, a consonant-cluster shortening step, and a residual step.
Unlike German (whose rules are `match longest anywhere, THEN require
R1`), the Scandinavian suffix searches are limit-restricted: only
suffixes lying entirely inside R1 are candidates for the longest match
("search for the longest among the following suffixes in R1").
Preceding-letter conditions (valid s-endings) may look outside R1.

From-scratch Python; the reference contains only 42-line language-name
wrappers, no algorithm bodies.
"""

from __future__ import annotations

from typing import Optional, Sequence


def _longest_in_r1(w: str, r1: int, suffixes: Sequence[str]) -> Optional[str]:
    """Longest suffix of w that lies entirely within R1 (Snowball
    `setlimit tomark p1 for ([substring])` semantics)."""
    best = None
    for s in suffixes:
        if (w.endswith(s) and len(w) - len(s) >= r1
                and (best is None or len(s) > len(best))):
            best = s
    return best


def _scand_r1(w: str, vowels: frozenset) -> int:
    """R1 start: after the first non-vowel following a vowel; clamped so
    at least 3 letters precede it (shared by da/no/sv, as in de)."""
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in vowels and w[i - 1] in vowels:
            r1 = i + 1
            break
    return min(max(r1, 3), n)


# ---------------------------------------------------------------- Danish

_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")

_DA_STEP1 = [
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret", "s",
]


def snowball_da_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _DA_VOWELS)

    # step 1: longest suffix in R1; 's' deletes only after a valid
    # s-ending (that letter may sit outside R1); no backtracking to a
    # shorter suffix when the condition fails
    suf = _longest_in_r1(w, r1, _DA_STEP1)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _DA_S_END:
            w = w[:-1]
    elif suf is not None:
        w = w[: -len(suf)]

    def step2(w: str) -> str:
        # consonant-pair shortening: gd dt gt kt in R1 -> drop last letter
        if _longest_in_r1(w, r1, ["gd", "dt", "gt", "kt"]):
            return w[:-1]
        return w

    w = step2(w)

    # step 3: the igst pre-rule is NOT region-restricted
    if w.endswith("igst"):
        w = w[:-2]
    suf = _longest_in_r1(w, r1, ["ig", "lig", "elig", "els", "løst"])
    if suf == "løst":
        w = w[:-1]
    elif suf is not None:
        w = w[: -len(suf)]
        w = step2(w)

    # step 4: undouble a final double consonant whose last letter is in R1
    if (len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS
            and len(w) - 1 >= r1):
        w = w[:-1]
    return w


# -------------------------------------------------------------- Norwegian

_NO_VOWELS = frozenset("aeiouyæåø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")

_NO_STEP1 = [
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
    "s", "erte", "ert",
]


def snowball_no_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _NO_VOWELS)

    suf = _longest_in_r1(w, r1, _NO_STEP1)
    if suf == "s":
        # valid s-ending: the listed consonants, or k not after a vowel
        if len(w) >= 2 and (
            w[-2] in _NO_S_END
            or (w[-2] == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS))
        ):
            w = w[:-1]
    elif suf in ("erte", "ert"):
        w = w[: -len(suf)] + "er"
    elif suf is not None:
        w = w[: -len(suf)]

    # step 2: dt / vt in R1 -> drop last letter
    if _longest_in_r1(w, r1, ["dt", "vt"]):
        w = w[:-1]

    # step 3: longest among in R1 -> delete
    suf = _longest_in_r1(w, r1, [
        "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov",
        "elov", "slov", "hetslov",
    ])
    if suf is not None:
        w = w[: -len(suf)]
    return w


# ---------------------------------------------------------------- Swedish

_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")

_SV_STEP1 = [
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
    "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es",
    "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
    "het", "ast", "s",
]


def snowball_sv_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _SV_VOWELS)

    suf = _longest_in_r1(w, r1, _SV_STEP1)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _SV_S_END:
            w = w[:-1]
    elif suf is not None:
        w = w[: -len(suf)]

    # step 2: consonant clusters in R1 -> drop last letter
    if _longest_in_r1(w, r1, ["dd", "gd", "nn", "dt", "gt", "kt", "tt"]):
        w = w[:-1]

    # step 3
    suf = _longest_in_r1(w, r1, ["lig", "ig", "els", "löst", "fullt"])
    if suf in ("lig", "ig", "els"):
        w = w[: -len(suf)]
    elif suf == "löst":
        w = w[:-1]
    elif suf == "fullt":
        w = w[:-1]
    return w
