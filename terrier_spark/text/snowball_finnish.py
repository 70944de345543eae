"""Finnish Snowball stemmer, implemented from the published algorithm
(snowballstem.org/algorithms/finnish/stemmer.html, classic revision —
the algorithm behind the org.tartarus program the reference wraps in
FinnishSnowballStemmer.java).

Regions: standard R1/R2 (no minimum-3 clamp).  Suffix searches are
limit-restricted to R1/R2 (the whole suffix must lie inside the
region); preceding-letter conditions may look outside.  From-scratch
Python; the reference contains only a 42-line language-name wrapper.
"""

from __future__ import annotations

from terrier_spark.text.snowball_nordic import _longest_in_r1

_FI_VOWELS = frozenset("aeiouyäö")
_FI_LONG_V = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_FI_STEP1 = ["kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa",
             "pä", "sti"]
# harmonizing hXn suffixes: suffix -> required preceding vowel
_FI_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o", "hun": "u",
           "hyn": "y", "hän": "ä", "hön": "ö"}
_FI_STEP3 = (
    list(_FI_HXN) + ["siin", "den", "tten", "seen", "a", "ä", "tta",
                     "ttä", "ta", "tä", "ssa", "ssä", "sta", "stä",
                     "lla", "llä", "lta", "ltä", "lle", "na", "nä",
                     "ksi", "ine", "n"]
)


def _fi_regions(w: str) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in _FI_VOWELS and w[i - 1] in _FI_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _FI_VOWELS and w[i - 1] in _FI_VOWELS:
            r2 = i + 1
            break
    return r1, r2


def snowball_fi_stem(word: str) -> str:
    w = word
    r1, r2 = _fi_regions(w)

    # step 1 (particles): longest in R1; kin-group needs n, t or a
    # vowel before it; sti needs R2
    suf = _longest_in_r1(w, r1, _FI_STEP1)
    if suf == "sti":
        if len(w) - 3 >= r2:
            w = w[:-3]
    elif suf is not None:
        prev = w[-len(suf) - 1] if len(w) > len(suf) else ""
        if prev == "n" or prev == "t" or prev in _FI_VOWELS:
            w = w[: -len(suf)]

    # step 2 (possessives): longest in R1, per-rule conditions
    suf = _longest_in_r1(
        w, r1, ["si", "ni", "nsa", "nsä", "mme", "nne", "an", "än", "en"]
    )
    if suf == "si":
        if not (len(w) >= 3 and w[-3] == "k"):
            w = w[:-2]
    elif suf == "ni":
        w = w[:-2]
        if w.endswith("kse"):
            w = w[:-1] + "i"
    elif suf in ("nsa", "nsä", "mme", "nne"):
        w = w[: -len(suf)]
    elif suf == "an":
        if w[:-2].endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
            w = w[:-2]
    elif suf == "än":
        if w[:-2].endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
            w = w[:-2]
    elif suf == "en":
        if w[:-2].endswith(("lle", "ine")):
            w = w[:-2]

    # step 3 (cases): longest in R1, per-rule conditions; no backoff to
    # a shorter suffix when a condition fails
    ending_removed = False
    suf = _longest_in_r1(w, r1, _FI_STEP3)
    if suf in _FI_HXN:
        if len(w) > 3 and w[-4] == _FI_HXN[suf]:
            w = w[:-3]
            ending_removed = True
    elif suf in ("siin", "den", "tten"):
        stem = w[: -len(suf)]
        if (len(stem) >= 2 and stem[-1] == "i"
                and stem[-2] in _FI_VOWELS):
            w = stem
            ending_removed = True
    elif suf == "seen":
        if w[:-4].endswith(_FI_LONG_V):
            w = w[:-4]
            ending_removed = True
    elif suf in ("a", "ä"):
        # preceded by cv
        if (len(w) >= 3 and w[-2] in _FI_VOWELS
                and w[-3] not in _FI_VOWELS):
            w = w[:-1]
            ending_removed = True
    elif suf in ("tta", "ttä"):
        if w[:-3].endswith("e"):
            w = w[:-3]
            ending_removed = True
    elif suf == "n":
        w = w[:-1]
        ending_removed = True
        if w.endswith(_FI_LONG_V) or w.endswith("ie"):
            w = w[:-1]
    elif suf is not None:
        w = w[: -len(suf)]
        ending_removed = True

    # step 4 (other endings): longest in R2
    suf = _longest_in_r1(w, r2, [
        "mpi", "mpa", "mpä", "mmi", "mma", "mmä",
        "impi", "impa", "impä", "immi", "imma", "immä", "eja", "ejä",
    ])
    if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
        if not w[:-3].endswith("po"):
            w = w[:-3]
    elif suf is not None:
        w = w[: -len(suf)]

    # step 5 (plurals)
    if ending_removed:
        if w and w[-1] in "ij" and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        if (w.endswith("t") and len(w) - 1 >= r1
                and len(w) >= 2 and w[-2] in _FI_VOWELS):
            w = w[:-1]
            if w.endswith("imma") and len(w) - 4 >= r2:
                w = w[:-4]
            elif (w.endswith("mma") and len(w) - 3 >= r2
                    and not w[:-3].endswith("po")):
                w = w[:-3]

    # step 6 (tidying), (a)-(d) restricted to R1
    if _longest_in_r1(w, r1, list(_FI_LONG_V)):
        w = w[:-1]
    if (len(w) >= 2 and len(w) - 2 >= r1 and w[-1] in "aäei"
            and w[-2] not in _FI_VOWELS):
        w = w[:-1]
    if _longest_in_r1(w, r1, ["oj", "uj"]):
        w = w[:-1]
    if _longest_in_r1(w, r1, ["jo"]):
        w = w[:-1]
    # (e) unrestricted: double consonant before trailing vowels ->
    # remove the last consonant of the pair
    i = len(w)
    while i > 0 and w[i - 1] in _FI_VOWELS:
        i -= 1
    if i >= 2 and w[i - 1] == w[i - 2] and w[i - 1] not in _FI_VOWELS:
        w = w[: i - 1] + w[i:]
    return w
