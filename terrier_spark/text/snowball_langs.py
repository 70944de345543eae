"""German, French and Spanish Snowball stemmers, implemented from the
published algorithms (snowballstem.org/algorithms/{german,french,
spanish}/stemmer.html, classic revisions).

The reference exposes these as GermanSnowballStemmer /
FrenchSnowballStemmer / SpanishSnowballStemmer
(org/terrier/terms/*SnowballStemmer.java), thin wrappers over the
public org.tartarus Snowball programs; these are from-scratch Python
implementations of the same published algorithms.
"""

from __future__ import annotations

from typing import Optional, Sequence


def _longest(w: str, suffixes: Sequence[str]) -> Optional[str]:
    """Snowball 'among' semantics: the longest suffix of w present in
    the candidate set (ties impossible: equal-length candidates are
    distinct strings)."""
    best = None
    for s in suffixes:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# ---------------------------------------------------------------- German

_DE_VOWELS = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")
_DE_ST_END = frozenset("bdfghklmnt")


def _de_regions(w: str) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in _DE_VOWELS and w[i - 1] in _DE_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _DE_VOWELS and w[i - 1] in _DE_VOWELS:
            r2 = i + 1
            break
    # the region before R1 must contain at least 3 letters
    r1 = min(max(r1, 3), n)
    return r1, r2


def snowball_de_stem(word: str) -> str:
    w = word.replace("ß", "ss")
    # u/y between vowels are consonants -> mark upper-case
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if (chars[i] in "uy" and chars[i - 1] in _DE_VOWELS
                and chars[i + 1] in _DE_VOWELS):
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _de_regions(w)

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    # step 1
    suf = _longest(w, ["ern", "em", "er", "en", "es", "e", "s"])
    if suf in ("ern", "em", "er"):
        if in_r1(suf):
            w = w[: -len(suf)]
    elif suf in ("en", "es", "e"):
        if in_r1(suf):
            w = w[: -len(suf)]
            if w.endswith("niss"):
                w = w[:-1]
    elif suf == "s":
        if in_r1("s") and len(w) >= 2 and w[-2] in _DE_S_END:
            w = w[:-1]

    # step 2
    suf = _longest(w, ["est", "en", "er", "st"])
    if suf in ("est", "en", "er"):
        if in_r1(suf):
            w = w[: -len(suf)]
    elif suf == "st":
        # valid st-ending itself preceded by at least 3 letters
        if in_r1("st") and len(w) >= 6 and w[-3] in _DE_ST_END:
            w = w[:-2]

    # step 3 (d-suffixes)
    suf = _longest(
        w, ["isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"]
    )
    if suf in ("end", "ung"):
        if in_r2(suf):
            w = w[: -len(suf)]
            if (w.endswith("ig") and in_r2("ig")
                    and (len(w) < 3 or w[-3] != "e")):
                w = w[:-2]
    elif suf in ("ig", "ik", "isch"):
        if in_r2(suf) and (len(w) <= len(suf) or w[-len(suf) - 1] != "e"):
            w = w[: -len(suf)]
    elif suf in ("lich", "heit"):
        if in_r2(suf):
            w = w[: -len(suf)]
            for s2 in ("er", "en"):
                if w.endswith(s2) and in_r1(s2):
                    w = w[:-2]
                    break
    elif suf == "keit":
        if in_r2("keit"):
            w = w[:-4]
            if w.endswith("lich") and in_r2("lich"):
                w = w[:-4]
            elif w.endswith("ig") and in_r2("ig"):
                w = w[:-2]

    return (w.replace("U", "u").replace("Y", "y")
            .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------- French

_FR_VOWELS = frozenset("aeiouyâàëéêèïîôûù")

_FR_S1 = [
    # group -> handled by suffix identity below; list is the union
    "issements", "issement", "atrices", "amment", "emment", "ements",
    "ateurs", "ations", "atrice", "logies", "usions", "utions", "ement",
    "ances", "iqUes", "ismes", "ables", "istes", "ateur", "ation",
    "euses", "ments", "logie", "usion", "ution", "ences", "ance", "iqUe",
    "isme", "able", "iste", "ités", "ives", "eaux", "euse", "ment",
    "ence", "eux", "ité", "ive", "ifs", "aux", "if",
]
_FR_S2A = [
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse", "ies",
    "ira", "ît", "ie", "ir", "is", "it", "i",
]
_FR_S2B_ER = [
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "er",
    "ez", "és", "é",
]
_FR_S2B_A = [
    "assions", "assiez", "assent", "asses", "antes", "aIent", "âtes",
    "âmes", "asse", "ants", "ante", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
]


def _fr_mark(w: str) -> str:
    chars = list(w)
    n = len(chars)
    for i, c in enumerate(chars):
        # already-marked (uppercase) neighbors count as consonants
        prev_v = i > 0 and chars[i - 1] in _FR_VOWELS
        next_v = i + 1 < n and chars[i + 1] in _FR_VOWELS
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _fr_is_v(c: str) -> bool:
    return c in _FR_VOWELS  # marked U/I/Y are consonants


def _fr_regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    if n >= 3 and _fr_is_v(w[0]) and _fr_is_v(w[1]):
        rv = 3
    elif w[:3] in ("par", "col", "tap"):
        rv = 3
    else:
        rv = n
        for i in range(1, n):
            if _fr_is_v(w[i]):
                rv = i + 1
                break
    r1 = n
    for i in range(1, n):
        if not _fr_is_v(w[i]) and _fr_is_v(w[i - 1]):
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if not _fr_is_v(w[i]) and _fr_is_v(w[i - 1]):
            r2 = i + 1
            break
    return rv, r1, r2


def snowball_fr_stem(word: str) -> str:
    w = _fr_mark(word)
    rv, r1, r2 = _fr_regions(w)

    def in_reg(suf: str, start: int, v: str = "") -> bool:
        return len(v or w) - len(suf) >= start

    altered = False
    found_ment = False

    # ---- step 1: standard suffixes
    suf = _longest(w, _FR_S1)
    if suf is not None:
        base = w[: -len(suf)]
        if suf in ("ances", "iqUes", "ismes", "ables", "istes", "ance",
                   "iqUe", "isme", "able", "iste", "eux"):
            if in_reg(suf, r2):
                w, altered = base, True
        elif suf in ("atrices", "ateurs", "ations", "atrice", "ateur",
                     "ation"):
            if in_reg(suf, r2):
                w, altered = base, True
                if w.endswith("ic"):
                    if in_reg("ic", r2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif suf in ("logies", "logie"):
            if in_reg(suf, r2):
                w, altered = base + "log", True
        elif suf in ("usions", "utions", "usion", "ution"):
            if in_reg(suf, r2):
                w, altered = base + "u", True
        elif suf in ("ences", "ence"):
            if in_reg(suf, r2):
                w, altered = base + "ent", True
        elif suf in ("ements", "ement"):
            if in_reg(suf, rv):
                w, altered = base, True
                if w.endswith("iv") and in_reg("iv", r2):
                    w = w[:-2]
                    if w.endswith("at") and in_reg("at", r2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_reg("eus", r2):
                        w = w[:-3]
                    elif in_reg("eus", r1):
                        w = w[:-3] + "eux"
                elif w.endswith("abl") and in_reg("abl", r2):
                    w = w[:-3]
                elif w.endswith("iqU") and in_reg("iqU", r2):
                    w = w[:-3]
                elif ((w.endswith("ièr") or w.endswith("Ièr"))
                      and in_reg("ièr", rv)):
                    w = w[:-3] + "i"
        elif suf in ("ités", "ité"):
            if in_reg(suf, r2):
                w, altered = base, True
                if w.endswith("abil"):
                    w = w[:-4] if in_reg("abil", r2) else w[:-4] + "abl"
                elif w.endswith("ic"):
                    w = w[:-2] if in_reg("ic", r2) else w[:-2] + "iqU"
                elif w.endswith("iv") and in_reg("iv", r2):
                    w = w[:-2]
        elif suf in ("ives", "ive", "ifs", "if"):
            if in_reg(suf, r2):
                w, altered = base, True
                if w.endswith("at") and in_reg("at", r2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        w = w[:-2] if in_reg("ic", r2) else w[:-2] + "iqU"
        elif suf == "eaux":
            w, altered = base + "eau", True
        elif suf == "aux":
            if in_reg("aux", r1):
                w, altered = base + "al", True
        elif suf in ("euses", "euse"):
            if in_reg(suf, r2):
                w, altered = base, True
            elif in_reg(suf, r1):
                w, altered = base + "eux", True
        elif suf in ("issements", "issement"):
            if in_reg(suf, r1) and base and not _fr_is_v(base[-1]):
                w, altered = base, True
        elif suf == "amment":
            found_ment = True
            if in_reg(suf, rv):
                w, altered = base + "ant", True
        elif suf == "emment":
            found_ment = True
            if in_reg(suf, rv):
                w, altered = base + "ent", True
        elif suf in ("ments", "ment"):
            found_ment = True
            # delete if preceded by a vowel in RV
            if base and _fr_is_v(base[-1]) and len(base) - 1 >= rv:
                w, altered = base, True

    # ---- steps 2a/2b: verb suffixes (confined to RV)
    step1_altered = altered
    if not step1_altered or found_ment:
        suf = _longest(w, _FR_S2A)
        did2a_delete = False
        if (suf is not None and in_reg(suf, rv)
                and len(w) - len(suf) - 1 >= rv
                and not _fr_is_v(w[-len(suf) - 1])):
            w = w[: -len(suf)]
            altered = did2a_delete = True
        if not did2a_delete:
            suf = _longest(w, ["ions"] + _FR_S2B_ER + _FR_S2B_A)
            if suf == "ions":
                if in_reg(suf, r2) and in_reg(suf, rv):
                    w, altered = w[:-4], True
            elif suf in _FR_S2B_ER:
                if in_reg(suf, rv):
                    w, altered = w[: -len(suf)], True
            elif suf in _FR_S2B_A:
                if in_reg(suf, rv):
                    w, altered = w[: -len(suf)], True
                    if w.endswith("e") and len(w) - 1 >= rv:
                        w = w[:-1]

    if altered:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4
        if (w.endswith("s") and len(w) >= 2
                and w[-2] not in "aiouès"):
            w = w[:-1]
        suf = _longest(w, ["ière", "Ière", "ier", "Ier", "ion", "e", "ë"])
        if suf == "ion":
            # in R2, and preceded by s or t which must itself be in RV
            if (len(w) >= 4 and in_reg("ion", r2)
                    and w[-4] in "st" and len(w) - 4 >= rv):
                w = w[:-3]
        elif suf in ("ière", "Ière", "ier", "Ier"):
            if in_reg(suf, rv):
                w = w[: -len(suf)] + "i"
        elif suf == "e":
            if in_reg("e", rv):
                w = w[:-1]
        elif suf == "ë":
            if in_reg("ë", rv) and w.endswith("guë"):
                w = w[:-1]

    # step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break

    # step 6: un-accent é/è before trailing non-vowels
    i = len(w) - 1
    k = 0
    while i >= 0 and not _fr_is_v(w[i]):
        i -= 1
        k += 1
    if k >= 1 and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


# --------------------------------------------------------------- Spanish

_ES_VOWELS = frozenset("aeiouáéíóúü")

_ES_PRON = ["selas", "selos", "sela", "selo", "las", "les", "los", "nos",
            "me", "se", "la", "le", "lo"]
_ES_PRON_A = ["iéndo", "ándo", "ár", "ér", "ír"]
_ES_PRON_B = ["iendo", "ando", "ar", "er", "ir"]

_ES_S1 = [
    "amientos", "imientos", "amiento", "imiento", "aciones", "uciones",
    "adoras", "adores", "ancias", "logías", "encias", "amente",
    "idades", "anzas", "ismos", "ables", "ibles", "istas", "adora",
    "ación", "antes", "ancia", "logía", "ución", "encia", "mente",
    "anza", "icos", "icas", "ismo", "able", "ible", "ista", "osos",
    "osas", "ador", "ante", "idad", "ivas", "ivos", "ico", "ica",
    "oso", "osa", "iva", "ivo",
]
_ES_S2B = [
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais",
    "ieseis", "asteis", "isteis", "ábamos", "áramos", "ásemos",
    "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
    "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
    "ieses", "abais", "arais", "aseis", "íamos", "arán", "arás",
    "aría", "erán", "erás", "ería", "irán", "irás", "iría", "iera",
    "iese", "aste", "iste", "aban", "aran", "asen", "aron", "ando",
    "abas", "adas", "idas", "aras", "ases", "íais", "ados", "idos",
    "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba",
    "ada", "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
    "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as",
    "ís",
]
_ES_S2B_GU = ["en", "es", "éis", "emos"]


def _es_regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    rv = n
    if n >= 2:
        if w[1] not in _ES_VOWELS:
            # next following vowel
            for i in range(2, n):
                if w[i] in _ES_VOWELS:
                    rv = i + 1
                    break
        elif w[0] in _ES_VOWELS and w[1] in _ES_VOWELS:
            for i in range(2, n):
                if w[i] not in _ES_VOWELS:
                    rv = i + 1
                    break
        else:  # consonant-vowel
            rv = min(3, n)
            if n < 3:
                rv = n
    r1 = n
    for i in range(1, n):
        if w[i] not in _ES_VOWELS and w[i - 1] in _ES_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _ES_VOWELS and w[i - 1] in _ES_VOWELS:
            r2 = i + 1
            break
    return rv, r1, r2


_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")


def snowball_es_stem(word: str) -> str:
    w = word
    rv, r1, r2 = _es_regions(w)

    def in_reg(suf: str, start: int) -> bool:
        return len(w) - len(suf) >= start

    # ---- step 0: attached pronoun
    pron = _longest(w, _ES_PRON)
    if pron is not None:
        base = w[: -len(pron)]
        pre_a = _longest(base, _ES_PRON_A)
        pre_b = _longest(base, _ES_PRON_B)
        if pre_a is not None and len(base) - len(pre_a) >= rv:
            w = base[: -len(pre_a)] + pre_a.translate(_ES_UNACCENT)
        elif pre_b is not None and len(base) - len(pre_b) >= rv:
            w = base
        elif (base.endswith("yendo") and len(base) >= 6
              and base[-6] == "u" and len(base) - 5 >= rv):
            w = base

    # ---- step 1: standard suffixes
    removed1 = False
    suf = _longest(w, _ES_S1)
    if suf is not None:
        base = w[: -len(suf)]
        if suf in ("anzas", "anza", "icos", "icas", "ico", "ica",
                   "ismos", "ismo", "ables", "able", "ibles", "ible",
                   "istas", "ista", "osos", "osas", "oso", "osa",
                   "amientos", "imientos", "amiento", "imiento"):
            if in_reg(suf, r2):
                w, removed1 = base, True
        elif suf in ("adoras", "adores", "aciones", "adora", "ador",
                     "ación", "antes", "ante", "ancias", "ancia"):
            if in_reg(suf, r2):
                w, removed1 = base, True
                if w.endswith("ic") and in_reg("ic", r2):
                    w = w[:-2]
        elif suf in ("logías", "logía"):
            if in_reg(suf, r2):
                w, removed1 = base + "log", True
        elif suf in ("uciones", "ución"):
            if in_reg(suf, r2):
                w, removed1 = base + "u", True
        elif suf in ("encias", "encia"):
            if in_reg(suf, r2):
                w, removed1 = base + "ente", True
        elif suf == "amente":
            if in_reg(suf, r1):
                w, removed1 = base, True
                if w.endswith("iv") and in_reg("iv", r2):
                    w = w[:-2]
                    if w.endswith("at") and in_reg("at", r2):
                        w = w[:-2]
                else:
                    for s2 in ("os", "ic", "ad"):
                        if w.endswith(s2) and in_reg(s2, r2):
                            w = w[:-2]
                            break
        elif suf == "mente":
            if in_reg(suf, r2):
                w, removed1 = base, True
                for s2 in ("ante", "able", "ible"):
                    if w.endswith(s2) and in_reg(s2, r2):
                        w = w[: -len(s2)]
                        break
        elif suf in ("idades", "idad"):
            if in_reg(suf, r2):
                w, removed1 = base, True
                for s2 in ("abil", "ic", "iv"):
                    if w.endswith(s2) and in_reg(s2, r2):
                        w = w[: -len(s2)]
                        break
        elif suf in ("ivas", "ivos", "iva", "ivo"):
            if in_reg(suf, r2):
                w, removed1 = base, True
                if w.endswith("at") and in_reg("at", r2):
                    w = w[:-2]

    # ---- step 2a: verb suffixes beginning y (if step 1 removed nothing)
    if not removed1:
        suf = _longest(w, ["yeron", "yendo", "yamos", "yais", "yan",
                           "yen", "yas", "yes", "ya", "ye", "yo", "yó"])
        did2a = False
        if (suf is not None and in_reg(suf, rv)
                and len(w) > len(suf) and w[-len(suf) - 1] == "u"):
            w = w[: -len(suf)]
            did2a = True
        # ---- step 2b (if step 2a removed nothing)
        if not did2a:
            suf = _longest(w, _ES_S2B + _ES_S2B_GU)
            if suf is not None and in_reg(suf, rv):
                w = w[: -len(suf)]
                if suf in _ES_S2B_GU and w.endswith("gu"):
                    w = w[:-1]

    # ---- step 3: residual suffix (in RV)
    suf = _longest(w, ["os", "a", "o", "á", "í", "ó", "e", "é"])
    if suf is not None and in_reg(suf, rv):
        if suf in ("e", "é"):
            w = w[: -len(suf)]
            if w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]
        else:
            w = w[: -len(suf)]

    return w.translate(_ES_UNACCENT)
