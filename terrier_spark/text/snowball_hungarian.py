"""Hungarian Snowball stemmer, implemented from the published algorithm
(snowballstem.org/algorithms/hungarian/stemmer.html, classic revision —
the algorithm behind the org.tartarus program the reference wraps in
HungarianSnowballStemmer.java).

Hungarian's R1 is unusual: a word starting with a vowel takes R1 after
the first consonant OR digraph (cs dz dzs gy ly ny sz ty zs count as a
single consonant); a word starting with a consonant takes R1 after the
first vowel.  All nine suffix steps are restricted to R1; instrumental
(-al/-el) and factive (-á/-é) suffixes additionally require a preceding
double consonant, which is undoubled on removal (including the digraph
doubles ccs/ssz/zzs/ggy/lly/nny/tty -> cs/sz/zs/gy/ly/ny/ty).

From-scratch Python; the reference contains only a 42-line language-name
wrapper.  Suffix tables reconstructed from the published description and
verified with hand-traced goldens.
"""

from __future__ import annotations

from typing import Optional, Sequence

_HU_VOWELS = frozenset("aáeéiíoóöőuúüű")
_HU_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
# double consonants, longest first (the digraph doubles before plain)
_HU_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
    "pp", "rr", "ss", "tt", "vv", "zz",
)


def _hu_r1(w: str) -> int:
    n = len(w)
    if not n:
        return 0
    if w[0] in _HU_VOWELS:
        # after the first consonant or digraph
        i = 1
        while i < n:
            if w[i] not in _HU_VOWELS:
                for d in _HU_DIGRAPHS:
                    if w.startswith(d, i):
                        return min(i + len(d), n)
                return i + 1
            i += 1
        return n
    for i in range(1, n):
        if w[i] in _HU_VOWELS:
            return i + 1
    return n


def _ends_double(w: str) -> Optional[str]:
    for d in _HU_DOUBLES:
        if w.endswith(d):
            return d
    return None


def _undouble(w: str) -> str:
    d = _ends_double(w)
    if d is None:
        return w
    if len(d) == 3:  # ccs -> cs etc: drop the first letter of the three
        return w[: -3] + d[1:]
    return w[:-1]


def _longest_in(w: str, r1: int, suffixes: Sequence[str]) -> Optional[str]:
    best = None
    for s in suffixes:
        if (w.endswith(s) and len(w) - len(s) >= r1
                and (best is None or len(s) > len(best))):
            best = s
    return best


def _unlengthen(w: str) -> str:
    """Final á -> a, final é -> e (applied after several steps)."""
    if w.endswith("á"):
        return w[:-1] + "a"
    if w.endswith("é"):
        return w[:-1] + "e"
    return w


_HU_STEP2 = [
    "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val", "vel",
    "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
    "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp",
    "képpen", "kor", "ul", "ül", "vá", "vé", "onként", "enként",
    "anként", "ként", "en", "on", "an", "ön", "n", "t",
]

_HU_STEP6_DELETE = ["oké", "öké", "aké", "eké", "ké", "éi", "é"]
_HU_STEP6_A = ["áké", "áéi"]
_HU_STEP6_E = ["éké", "ééi"]

_HU_STEP7_DELETE = [
    "ünk", "unk", "nk", "juk", "jük", "uk", "ük", "em", "om", "am",
    "m", "od", "ed", "ad", "öd", "d", "ja", "je", "a", "e", "o",
]
_HU_STEP7_A = ["ánk", "ájuk", "ám", "ád", "á"]
_HU_STEP7_E = ["énk", "éjük", "ém", "éd", "é"]

_HU_STEP8_DELETE = [
    "jaim", "jeim", "aim", "eim", "im", "jaid", "jeid", "aid", "eid",
    "id", "jai", "jei", "ai", "ei", "i", "jaink", "jeink", "aink",
    "eink", "ink", "jaitok", "jeitek", "aitok", "eitek", "itek",
    "jeik", "jaik", "aik", "eik", "ik",
]
_HU_STEP8_A = ["áim", "áid", "ái", "áink", "áitok", "áik"]
_HU_STEP8_E = ["éim", "éid", "éi", "éink", "éitek", "éik"]


def snowball_hu_stem(word: str) -> str:
    w = word
    r1 = _hu_r1(w)

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    # step 1: instrumental al/el after a double consonant
    suf = _longest_in(w, r1, ["al", "el"])
    if suf is not None and _ends_double(w[:-2]):
        w = _undouble(w[:-2])

    # step 2: frequent cases, then un-lengthen final á/é
    suf = _longest_in(w, r1, _HU_STEP2)
    if suf is not None:
        w = _unlengthen(w[: -len(suf)])

    # step 3: special cases
    suf = _longest_in(w, r1, ["án", "ánként", "én"])
    if suf in ("án", "ánként"):
        w = w[: -len(suf)] + "a"
    elif suf == "én":
        w = w[:-2] + "e"

    # step 4: other cases
    suf = _longest_in(
        w, r1, ["astul", "estül", "stul", "stül", "ástul", "éstül"]
    )
    if suf == "ástul":
        w = w[:-5] + "a"
    elif suf == "éstül":
        w = w[:-5] + "e"
    elif suf is not None:
        w = w[: -len(suf)]

    # step 5: factive á/é after a double consonant
    suf = _longest_in(w, r1, ["á", "é"])
    if suf is not None and _ends_double(w[:-1]):
        w = _undouble(w[:-1])

    # step 6: owned
    suf = _longest_in(w, r1, _HU_STEP6_DELETE + _HU_STEP6_A + _HU_STEP6_E)
    if suf in _HU_STEP6_A:
        w = w[: -len(suf)] + "a"
    elif suf in _HU_STEP6_E:
        w = w[: -len(suf)] + "e"
    elif suf is not None:
        w = w[: -len(suf)]

    # step 7: singular owner suffixes
    suf = _longest_in(w, r1, _HU_STEP7_DELETE + _HU_STEP7_A + _HU_STEP7_E)
    if suf in _HU_STEP7_A:
        w = w[: -len(suf)] + "a"
    elif suf in _HU_STEP7_E:
        w = w[: -len(suf)] + "e"
    elif suf is not None:
        w = w[: -len(suf)]

    # step 8: plural owner suffixes
    suf = _longest_in(w, r1, _HU_STEP8_DELETE + _HU_STEP8_A + _HU_STEP8_E)
    if suf in _HU_STEP8_A:
        w = w[: -len(suf)] + "a"
    elif suf in _HU_STEP8_E:
        w = w[: -len(suf)] + "e"
    elif suf is not None:
        w = w[: -len(suf)]

    # step 9: plural
    suf = _longest_in(w, r1, ["ák", "ék", "ök", "ok", "ek", "ak", "k"])
    if suf == "ák":
        w = w[:-2] + "a"
    elif suf == "ék":
        w = w[:-2] + "e"
    elif suf is not None:
        w = w[: -len(suf)]
    return w
