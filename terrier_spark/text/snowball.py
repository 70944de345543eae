"""English Snowball stemmer ("Porter2"), implemented from the published
algorithm (M.F. Porter, snowballstem.org/algorithms/english/stemmer.html).

The reference exposes it as EnglishSnowballStemmer
(org/terrier/terms/EnglishSnowballStemmer.java), a thin wrapper over the
public org.tartarus Snowball program; this is a from-scratch Python
implementation of the same published algorithm.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTION2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed",
     "exceed", "succeed"]
)

_STEP2 = [  # longest-match-first (suffix, replacement, None) — li/ogi special
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
]
_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"), ("ness", ""),
    ("ful", ""),
]
_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
    "ate", "iti", "ous", "ive", "ize", "al", "er", "ic",
]


def _mark_ys(w: str) -> str:
    """Initial y, or y after a vowel, is a consonant -> mark as Y.
    Left-to-right, so a y that stayed lowercase (= vowel) counts as the
    'after a vowel' context for the next y."""
    out = list(w)
    for i, c in enumerate(out):
        if c == "y" and (i == 0 or out[i - 1] in "aeiouy"):
            out[i] = "Y"
    return "".join(out)


def _is_v(w: str, i: int) -> bool:
    return w[i] in "aeiouy"  # Y (marked) is a consonant


def _regions(w: str) -> tuple[int, int]:
    """R1/R2 start offsets (len(w) if absent)."""
    n = len(w)
    r1 = n
    for p in ("gener", "commun", "arsen"):
        if w.startswith(p):
            r1 = len(p)
            break
    else:
        for i in range(1, n):
            if not _is_v(w, i) and _is_v(w, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_v(w, i) and _is_v(w, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(w: str) -> bool:
    n = len(w)
    if n >= 3:
        a, b, c = w[-3], w[-2], w[-1]
        if (not _is_v(w, n - 3)) and _is_v(w, n - 2) and (not _is_v(w, n - 1)) \
                and c not in "wx" and c != "Y":
            return True
    if n == 2 and _is_v(w, 0) and not _is_v(w, 1):
        return True
    return False


def _is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and _ends_short_syllable(w)


def snowball_en_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    if w.startswith("'"):
        w = w[1:]
    if w in _EXCEPTION1:
        return _EXCEPTION1[w]
    w = _mark_ys(w)
    r1, r2 = _regions(w)

    def in_r1(suffix: str) -> bool:
        return len(w) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(w) - len(suffix) >= r2

    # step 0: strip longest of ' 's 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("s") and not w.endswith("ss") and not w.endswith("us"):
        # delete if the preceding part contains a vowel NOT immediately
        # before the s
        if any(_is_v(w, i) for i in range(len(w) - 2)):
            w = w[:-1]

    if w.replace("Y", "y") in _EXCEPTION2:
        return w.replace("Y", "y")

    # step 1b
    if w.endswith("eedly"):
        if in_r1("eedly"):
            w = w[:-3]
    elif w.endswith("eed"):
        if in_r1("eed"):
            w = w[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(_is_v(stem, i) for i in range(len(stem))):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w = w + "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    else:
                        r1, r2 = _regions(w)
                        if _is_short(w, r1):
                            w = w + "e"
                break
    r1, r2 = _regions(w)

    # step 1c: y/Y -> i if preceded by a non-vowel which is not the first
    # letter
    if len(w) > 2 and w[-1] in "yY" and not _is_v(w, len(w) - 2):
        w = w[:-1] + "i"

    # step 2 (suffix in R1)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if in_r1(suf):
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if in_r1("ogi") and len(w) >= 4 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if in_r1("li") and len(w) >= 3 and w[-3] in _LI_ENDING:
                w = w[:-2]
    r1, r2 = _regions(w)

    # step 3 (suffix in R1; ative needs R2)
    if w.endswith("ative"):
        if in_r1("ative") and in_r2("ative"):
            w = w[:-5]
    else:
        for suf, rep in _STEP3:
            if w.endswith(suf):
                if in_r1(suf):
                    w = w[: -len(suf)] + rep
                break
    r1, r2 = _regions(w)

    # step 4 (suffix in R2)
    matched = False
    for suf in _STEP4:
        if w.endswith(suf):
            matched = True
            if in_r2(suf):
                w = w[: -len(suf)]
            break
    if not matched and w.endswith("ion"):
        if in_r2("ion") and len(w) >= 4 and w[-4] in "st":
            w = w[:-3]
    r1, r2 = _regions(w)

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")
