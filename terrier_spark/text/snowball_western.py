"""Dutch, Italian and Portuguese Snowball stemmers, implemented from the
published algorithms (snowballstem.org/algorithms/{dutch,italian,
portuguese}/stemmer.html, classic revisions — the algorithms behind the
org.tartarus programs the reference wraps in DutchSnowballStemmer.java /
ItalianSnowballStemmer.java / PortugueseSnowballStemmer.java).

From-scratch Python; the reference contains only 42-line language-name
wrappers, no algorithm bodies.
"""

from __future__ import annotations

from typing import Optional, Sequence

from terrier_spark.text.snowball_langs import _longest


def _std_regions(w: str, vowels: frozenset) -> tuple[int, int]:
    """Standard R1/R2: region after the first non-vowel following a
    vowel; R2 the same computed within R1."""
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in vowels and w[i - 1] in vowels:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in vowels and w[i - 1] in vowels:
            r2 = i + 1
            break
    return r1, r2


def _romance_rv(w: str, vowels: frozenset) -> int:
    """Romance RV: if the 2nd letter is a consonant, RV is after the
    next vowel; if the first two letters are vowels, after the next
    consonant; else (consonant-vowel) after the 3rd letter.  End of the
    word when the position doesn't exist."""
    n = len(w)
    if n < 2:
        return n
    if w[1] not in vowels:
        for i in range(2, n):
            if w[i] in vowels:
                return i + 1
        return n
    if w[0] in vowels:
        for i in range(2, n):
            if w[i] not in vowels:
                return i + 1
        return n
    return min(3, n)


# ------------------------------------------------------------------ Dutch

_NL_VOWELS = frozenset("aeiouyè")
_NL_UNACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_mark(w: str) -> str:
    """Initial y, y after a vowel, and i between vowels -> upper case
    (treated as consonants)."""
    chars = list(w)
    n = len(chars)
    for idx, c in enumerate(chars):
        if c == "y" and (idx == 0 or chars[idx - 1] in _NL_VOWELS):
            chars[idx] = "Y"
        elif (c == "i" and 0 < idx < n - 1
                and chars[idx - 1] in _NL_VOWELS
                and chars[idx + 1] in _NL_VOWELS):
            chars[idx] = "I"
    return "".join(chars)


def _nl_undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def snowball_nl_stem(word: str) -> str:
    w = _nl_mark(word.translate(_NL_UNACCENT))
    r1, r2 = _std_regions(w, _NL_VOWELS)
    r1 = min(max(r1, 3), len(w))

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    def valid_en(stem: str) -> bool:
        return (bool(stem) and stem[-1] not in _NL_VOWELS
                and not stem.endswith("gem"))

    # step 1: longest match anywhere, per-rule region conditions
    suf = _longest(w, ["heden", "ene", "en", "se", "s"])
    if suf == "heden":
        if in_r1("heden"):
            w = w[:-5] + "heid"
    elif suf in ("ene", "en"):
        if in_r1(suf) and valid_en(w[: -len(suf)]):
            w = _nl_undouble(w[: -len(suf)])
    elif suf in ("se", "s"):
        stem = w[: -len(suf)]
        if in_r1(suf) and stem and stem[-1] not in _NL_VOWELS \
                and stem[-1] != "j":
            w = stem

    # step 2: drop final e after a non-vowel in R1
    e_removed = False
    if (w.endswith("e") and in_r1("e") and len(w) >= 2
            and w[-2] not in _NL_VOWELS):
        w = _nl_undouble(w[:-1])
        e_removed = True

    # step 3a: heid (R2, not after c), then a preceding en as in step 1
    if w.endswith("heid") and in_r2("heid") and \
            (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en") and in_r1("en") and valid_en(w[:-2]):
            w = _nl_undouble(w[:-2])

    # step 3b: d-suffixes
    suf = _longest(w, ["end", "ing", "ig", "lijk", "baar", "bar"])
    if suf in ("end", "ing"):
        if in_r2(suf):
            w = w[: -len(suf)]
            if (w.endswith("ig") and in_r2("ig")
                    and (len(w) < 3 or w[-3] != "e")):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
    elif suf == "ig":
        if in_r2("ig") and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif suf == "lijk":
        if in_r2("lijk"):
            w = w[:-4]
            if (w.endswith("e") and in_r1("e") and len(w) >= 2
                    and w[-2] not in _NL_VOWELS):
                w = _nl_undouble(w[:-1])
    elif suf == "baar":
        if in_r2("baar"):
            w = w[:-4]
    elif suf == "bar":
        if in_r2("bar") and e_removed:
            w = w[:-3]

    # step 4: undouble vowel — C v v C (vv in aa/ee/oo/uu, last C != I)
    if len(w) >= 4:
        c1, v1, v2, c2 = w[-4], w[-3], w[-2], w[-1]
        if (c1 not in _NL_VOWELS and c2 not in _NL_VOWELS and c2 != "I"
                and v1 == v2 and v1 in "aeou"):
            w = w[:-2] + c2
    return w.replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------- Italian

_IT_VOWELS = frozenset("aeiouàèìòù")
_IT_GRAVE = str.maketrans("áéíóú", "àèìòù")

_IT_PRONOUNS = [
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene",
]

_IT_S1_DELETE_R2 = [
    "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi", "ismo",
    "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste", "isti",
    "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente",
    "atrice", "atrici", "ante", "anti",
]

_IT_VERBS = [
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
    "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
    "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti", "irete",
    "irò", "irono", "isca", "iscano", "isce", "isci", "isco", "iscono",
    "issero", "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano",
    "ivate", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar",
    "ir",
]


def _it_mark(w: str) -> str:
    """u after q, and u/i between vowels -> upper case (consonants)."""
    chars = list(w)
    n = len(chars)
    for idx, c in enumerate(chars):
        if c == "u" and idx > 0 and chars[idx - 1] == "q":
            chars[idx] = "U"
        elif (c in "ui" and 0 < idx < n - 1
                and chars[idx - 1] in _IT_VOWELS
                and chars[idx + 1] in _IT_VOWELS):
            chars[idx] = c.upper()
    return "".join(chars)


def snowball_it_stem(word: str) -> str:
    w = _it_mark(word.translate(_IT_GRAVE))
    r1, r2 = _std_regions(w, _IT_VOWELS)
    rv = _romance_rv(w, _IT_VOWELS)

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    def in_rv(suf: str) -> bool:
        return len(w) - len(suf) >= rv

    # step 0: attached pronouns after (in RV) ando/endo -> delete,
    # after ar/er/ir -> replace with e
    suf = _longest(w, _IT_PRONOUNS)
    if suf is not None and in_rv(suf):
        stem = w[: -len(suf)]
        if stem.endswith(("ando", "endo")) and len(stem) - 4 >= rv:
            w = stem
        elif stem.endswith(("ar", "er", "ir")) and len(stem) - 2 >= rv:
            w = stem + "e"

    altered = len(w)

    # step 1: standard suffixes (longest match anywhere, per-rule regions)
    suf = _longest(
        w,
        _IT_S1_DELETE_R2
        + ["azione", "azioni", "atore", "atori", "logia", "logie",
           "uzione", "uzioni", "usione", "usioni", "enza", "enze",
           "amento", "amenti", "imento", "imenti", "amente", "ità",
           "ivo", "ivi", "iva", "ive"],
    )
    if suf in ("azione", "azioni", "atore", "atori"):
        if in_r2(suf):
            w = w[: -len(suf)]
            if w.endswith("ic") and in_r2("ic"):
                w = w[:-2]
    elif suf in ("logia", "logie"):
        if in_r2(suf):
            w = w[: -len(suf)] + "log"
    elif suf in ("uzione", "uzioni", "usione", "usioni"):
        if in_r2(suf):
            w = w[: -len(suf)] + "u"
    elif suf in ("enza", "enze"):
        if in_r2(suf):
            w = w[: -len(suf)] + "ente"
    elif suf in ("amento", "amenti", "imento", "imenti"):
        if in_rv(suf):
            w = w[: -len(suf)]
    elif suf == "amente":
        if in_r1("amente"):
            w = w[:-6]
            if w.endswith("iv") and in_r2("iv"):
                w = w[:-2]
                if w.endswith("at") and in_r2("at"):
                    w = w[:-2]
            else:
                for s2 in ("os", "ic", "abil"):
                    if w.endswith(s2) and in_r2(s2):
                        w = w[: -len(s2)]
                        break
    elif suf == "ità":
        if in_r2("ità"):
            w = w[:-3]
            for s2 in ("abil", "ic", "iv"):
                if w.endswith(s2) and in_r2(s2):
                    w = w[: -len(s2)]
                    break
    elif suf in ("ivo", "ivi", "iva", "ive"):
        if in_r2(suf):
            w = w[: -len(suf)]
            if w.endswith("at") and in_r2("at"):
                w = w[:-2]
                if w.endswith("ic") and in_r2("ic"):
                    w = w[:-2]
    elif suf is not None:
        if in_r2(suf):
            w = w[: -len(suf)]

    # step 2: verb suffixes (in RV) only when step 1 removed nothing
    if len(w) == altered:
        suf = _longest(w, _IT_VERBS)
        if suf is not None and in_rv(suf):
            w = w[: -len(suf)]

    # step 3a: final vowel (then a preceding i) in RV
    if w and w[-1] in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b: final ch/gh -> c/g in RV
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 2 >= rv:
        w = w[:-1]
    return w.replace("I", "i").replace("U", "u")


# ------------------------------------------------------------- Portuguese

_PT_VOWELS = frozenset("aeiouáéíóúâêô")

_PT_S1_DELETE_R2 = [
    "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
    "amento", "amentos", "imento", "imentos", "adora", "ador",
    "aça~o", "adoras", "adores", "aço~es", "ante", "antes", "ância",
]

_PT_VERBS = [
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
    "iste", "ei", "arei", "erei", "irei", "am", "ado", "ido", "ando",
    "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as",
    "adas", "idas", "ias", "arias", "erias", "irias", "arás", "aras",
    "erás", "eras", "irás", "avas", "es", "ardes", "erdes", "irdes",
    "ares", "eres", "ires", "asses", "esses", "isses", "astes",
    "estes", "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis",
    "iríeis", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "ásseis", "ésseis", "ísseis", "áveis", "ados", "idos", "ámos",
    "amos", "íamos", "aríamos", "eríamos", "iríamos", "áramos",
    "éramos", "íramos", "ávamos", "emos", "aremos", "eremos",
    "iremos", "ássemos", "êssemos", "íssemos", "imos", "armos",
    "ermos", "irmos", "eu", "iu", "ou", "ira", "iras",
]


def snowball_pt_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    r1, r2 = _std_regions(w, _PT_VOWELS)
    rv = _romance_rv(w, _PT_VOWELS)

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    def in_rv(suf: str) -> bool:
        return len(w) - len(suf) >= rv

    altered = len(w)

    # step 1: standard suffixes
    suf = _longest(
        w,
        _PT_S1_DELETE_R2
        + ["logia", "logias", "uça~o", "uço~es", "ência", "ências",
           "amente", "mente", "idade", "idades", "iva", "ivo", "ivas",
           "ivos", "ira", "iras"],
    )
    if suf in ("logia", "logias"):
        if in_r2(suf):
            w = w[: -len(suf)] + "log"
    elif suf in ("uça~o", "uço~es"):
        if in_r2(suf):
            w = w[: -len(suf)] + "u"
    elif suf in ("ência", "ências"):
        if in_r2(suf):
            w = w[: -len(suf)] + "ente"
    elif suf == "amente":
        if in_r1("amente"):
            w = w[:-6]
            if w.endswith("iv") and in_r2("iv"):
                w = w[:-2]
                if w.endswith("at") and in_r2("at"):
                    w = w[:-2]
            else:
                for s2 in ("os", "ic", "ad"):
                    if w.endswith(s2) and in_r2(s2):
                        w = w[: -len(s2)]
                        break
    elif suf == "mente":
        if in_r2("mente"):
            w = w[:-5]
            for s2 in ("ante", "avel", "ível"):
                if w.endswith(s2) and in_r2(s2):
                    w = w[: -len(s2)]
                    break
    elif suf in ("idade", "idades"):
        if in_r2(suf):
            w = w[: -len(suf)]
            for s2 in ("abil", "ic", "iv"):
                if w.endswith(s2) and in_r2(s2):
                    w = w[: -len(s2)]
                    break
    elif suf in ("iva", "ivo", "ivas", "ivos"):
        if in_r2(suf):
            w = w[: -len(suf)]
            if w.endswith("at") and in_r2("at"):
                w = w[:-2]
    elif suf in ("ira", "iras"):
        if in_rv(suf) and w[: -len(suf)].endswith("e"):
            w = w[: -len(suf)] + "ir"
    elif suf is not None:
        if in_r2(suf):
            w = w[: -len(suf)]

    # step 2: verb suffixes (in RV) only when step 1 removed nothing
    if len(w) == altered:
        suf = _longest(w, _PT_VERBS)
        if suf is not None and in_rv(suf):
            w = w[: -len(suf)]

    if len(w) != altered:
        # step 3 (only when step 1 or 2 altered): i after c, in RV
        if w.endswith("i") and len(w) - 1 >= rv and len(w) >= 2 \
                and w[-2] == "c":
            w = w[:-1]
    else:
        # step 4 (only when neither altered): residual suffix in RV
        suf = _longest(w, ["os", "a", "i", "o", "á", "í", "ó"])
        if suf is not None and in_rv(suf):
            w = w[: -len(suf)]

    # step 5 (always): final e/é/ê in RV, then gu/ci contraction; or ç->c
    if w and w[-1] in "eéê" and len(w) - 1 >= rv:
        w = w[:-1]
        if ((w.endswith("gu") or w.endswith("ci"))
                and len(w) - 1 >= rv):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"
    return w.replace("a~", "ã").replace("o~", "õ")
