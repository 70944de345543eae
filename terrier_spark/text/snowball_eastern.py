"""Russian and Romanian Snowball stemmers, implemented from the
published algorithms (snowballstem.org/algorithms/{russian,romanian}/
stemmer.html, classic revisions — the algorithms behind the
org.tartarus programs the reference wraps in RussianSnowballStemmer.java
/ RomanianSnowballStemmer.java).

From-scratch Python; the reference contains only 42-line language-name
wrappers, no algorithm bodies.
"""

from __future__ import annotations

from typing import Optional, Sequence

from terrier_spark.text.snowball_langs import _longest

# ---------------------------------------------------------------- Russian

_RU_VOWELS = frozenset("аеиоуыэюя")

# group-1 endings must be preceded by а or я (which stays on the stem)
_RU_PERFECTIVE_1 = ["в", "вши", "вшись"]
_RU_PERFECTIVE_2 = ["ив", "ивши", "ившись", "ыв", "ывши", "ывшись"]
_RU_ADJECTIVE = [
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой",
    "ем", "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых",
    "ую", "юю", "ая", "яя", "ою", "ею",
]
_RU_PARTICIPLE_1 = ["ем", "нн", "вш", "ющ", "щ"]
_RU_PARTICIPLE_2 = ["ивш", "ывш", "ующ"]
_RU_REFLEXIVE = ["ся", "сь"]
_RU_VERB_1 = [
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
    "ет", "ют", "ны", "ть", "ешь", "нно",
]
_RU_VERB_2 = [
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
    "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю",
]
_RU_NOUN = [
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи",
    "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием",
    "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
    "ью", "ю", "ия", "ья", "я",
]
_RU_SUPERLATIVE = ["ейш", "ейше"]


def _ru_regions(w: str) -> tuple[int, int]:
    """RV = after the first vowel; R2 = standard R2."""
    n = len(w)
    rv = n
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    r1 = n
    for i in range(1, n):
        if w[i] not in _RU_VOWELS and w[i - 1] in _RU_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _RU_VOWELS and w[i - 1] in _RU_VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _ru_drop(w: str, rv: int, group1: Sequence[str],
             group2: Sequence[str]) -> Optional[str]:
    """Longest ending from group1 (must follow а/я, which stays) or
    group2 (unconditional), whole ending inside RV; None if no match.
    The а/я lookback is itself region-limited (`setlimit tomark pV`
    in the Snowball source): an а/я sitting before RV does not
    license a group-1 ending."""
    best, blen = None, -1
    for s in group1:
        if (w.endswith(s) and len(w) - len(s) >= rv
                and len(w) - len(s) - 1 >= rv
                and w[-len(s) - 1] in "ая"
                and len(s) > blen):
            best, blen = w[: -len(s)], len(s)
    for s in group2:
        if w.endswith(s) and len(w) - len(s) >= rv and len(s) > blen:
            best, blen = w[: -len(s)], len(s)
    return best


def snowball_ru_stem(word: str) -> str:
    w = word.replace("ё", "е")
    rv, r2 = _ru_regions(w)

    # step 1: PERFECTIVE GERUND, else [REFLEXIVE] then
    # ADJECTIVAL (adjective optionally preceded by participle) /
    # VERB / NOUN — first that matches wins
    got = _ru_drop(w, rv, _RU_PERFECTIVE_1, _RU_PERFECTIVE_2)
    if got is not None:
        w = got
    else:
        got = _ru_drop(w, rv, [], _RU_REFLEXIVE)
        if got is not None:
            w = got
        got = _ru_drop(w, rv, [], _RU_ADJECTIVE)
        if got is not None:
            w = got
            got = _ru_drop(w, rv, _RU_PARTICIPLE_1, _RU_PARTICIPLE_2)
            if got is not None:
                w = got
        else:
            got = _ru_drop(w, rv, _RU_VERB_1, _RU_VERB_2)
            if got is not None:
                w = got
            else:
                got = _ru_drop(w, rv, [], _RU_NOUN)
                if got is not None:
                    w = got

    # step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational ость/ост in R2
    suf = _longest(w, ["ость", "ост"])
    if suf is not None and len(w) - len(suf) >= r2:
        w = w[: -len(suf)]

    # step 4: (a) undouble нн, or (b) superlative (then undouble нн),
    # or (c) final ь
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        suf = _longest(w, _RU_SUPERLATIVE)
        if suf is not None and len(w) - len(suf) >= rv:
            w = w[: -len(suf)]
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w


# --------------------------------------------------------------- Romanian

_RO_VOWELS = frozenset("aăâeiîou")

_RO_STEP0 = {
    # suffix -> replacement (None = delete); all in R1
    "ul": None, "ului": None,
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "iilor": "i",
    "ilor": "i",
    "ile": "i",  # special: not after ab
    "atei": "at",
    "aţie": "aţi", "aţia": "aţi",
}

_RO_STEP1 = {
    "abilitate": "abil", "abilitati": "abil", "abilităi": "abil",
    "abilităţi": "abil",
    "ibilitate": "ibil",
    "ivitate": "iv", "ivitati": "iv", "ivităi": "iv", "ivităţi": "iv",
    "icitate": "ic", "icitati": "ic", "icităi": "ic", "icităţi": "ic",
    "icator": "ic", "icatori": "ic",
    "iciv": "ic", "iciva": "ic", "icive": "ic", "icivi": "ic",
    "icivă": "ic",
    "ical": "ic", "icala": "ic", "icale": "ic", "icali": "ic",
    "icală": "ic",
    "ativ": "at", "ativa": "at", "ative": "at", "ativi": "at",
    "ativă": "at", "aţiune": "at",
    "atoare": "at", "ator": "at", "atori": "at",
    "ătoare": "at", "ător": "at", "ători": "at",
    "itiv": "it", "itiva": "it", "itive": "it", "itivi": "it",
    "itivă": "it", "iţiune": "it",
    "itoare": "it", "itor": "it", "itori": "it",
}

_RO_STEP2_DELETE = [
    "at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti",
    "ute", "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice",
    "ici", "ică", "abil", "abila", "abile", "abili", "abilă", "ibil",
    "ibila", "ibile", "ibili", "ibilă", "oasa", "oasă", "oase", "os",
    "osi", "oşi", "ant", "anta", "ante", "anti", "antă", "ist",
    "ista", "iste", "isti", "istă", "işti", "ism", "isme", "ment",
    "menta", "mente", "menti", "mentă", "iv", "iva", "ive", "ivi",
    "ivă",
]

# verb suffixes deleted when preceded (in RV) by a consonant or u
_RO_VERB_COND = [
    "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându", "eze",
    "ească", "ez", "ezi", "ează", "esc", "eşti", "eşte", "ăsc",
    "ăşti", "ăşte", "am", "ai", "au", "eam", "eai", "eau", "iam",
    "iai", "iau", "aşi", "arăm", "arăţi", "ară", "uşi", "urăm",
    "urăţi", "ură", "irăm", "irăţi", "iră", "âşi", "ârăm",
    "ârăţi", "âră", "asem", "aseşi", "ase", "aserăm", "aserăţi",
    "aseră", "isem", "iseşi", "ise", "iserăm", "iserăţi", "iseră",
    "âsem", "âseşi", "âse", "âserăm", "âserăţi", "âseră", "usem",
    "useşi", "use", "userăm", "userăţi", "useră",
]
# verb suffixes deleted unconditionally (in RV)
_RO_VERB_UNCOND = [
    "ăm", "aţi", "em", "eţi", "im", "iţi", "âm", "âţi", "seşi",
    "serăm", "serăţi", "seră", "sei", "se", "sesem", "seseşi",
    "sese", "seserăm", "seserăţi", "seseră",
]


def _ro_mark(w: str) -> str:
    """i and u between vowels -> upper case (consonants)."""
    chars = list(w)
    n = len(chars)
    for idx, c in enumerate(chars):
        if (c in "iu" and 0 < idx < n - 1
                and chars[idx - 1] in _RO_VOWELS
                and chars[idx + 1] in _RO_VOWELS):
            chars[idx] = c.upper()
    return "".join(chars)


def snowball_ro_stem(word: str) -> str:
    from terrier_spark.text.snowball_western import (
        _romance_rv,
        _std_regions,
    )

    w = _ro_mark(word)
    r1, r2 = _std_regions(w, _RO_VOWELS)
    rv = _romance_rv(w, _RO_VOWELS)

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    def in_rv(suf: str) -> bool:
        return len(w) - len(suf) >= rv

    # step 0: removal of plurals (longest match, conditions per rule)
    suf = _longest(w, list(_RO_STEP0))
    if suf is not None and in_r1(suf):
        if suf == "ile":
            if not w[:-3].endswith("ab"):
                w = w[:-3] + "i"
        else:
            rep = _RO_STEP0[suf]
            w = w[: -len(suf)] + (rep or "")

    # step 1: combining suffixes, repeated until none applies
    standard_removed = False
    while True:
        suf = _longest(w, list(_RO_STEP1))
        if suf is None or not in_r1(suf):
            break
        w = w[: -len(suf)] + _RO_STEP1[suf]
        standard_removed = True

    # step 2: standard suffixes in R2
    suf = _longest(w, _RO_STEP2_DELETE + ["iune", "iuni"])
    if suf in ("iune", "iuni"):
        if in_r2(suf) and w[: -len(suf)].endswith("ţ"):
            w = w[: -len(suf) - 1] + "t"
            standard_removed = True
    elif suf is not None and in_r2(suf):
        w = w[: -len(suf)]
        standard_removed = True

    # step 3 (verb suffixes): only when steps 1-2 removed nothing.
    # Longest match over BOTH groups decides the rule; a failed
    # condition does not back off to a shorter suffix (among semantics)
    if not standard_removed:
        cands = [s for s in _RO_VERB_COND if w.endswith(s) and in_rv(s)]
        cands += [s for s in _RO_VERB_UNCOND if w.endswith(s) and in_rv(s)]
        if cands:
            best = max(cands, key=len)
            if best in _RO_VERB_UNCOND and (
                best not in _RO_VERB_COND
            ):
                w = w[: -len(best)]
            else:
                stem = w[: -len(best)]
                # preceded in RV by a consonant or u
                if (stem and len(stem) - 1 >= rv
                        and (stem[-1] not in _RO_VOWELS
                             or stem[-1] in "uU")):
                    w = stem

    # step 4: longest of ie/a/e/i/ă in RV -> delete
    suf = _longest(w, ["ie", "a", "e", "i", "ă"])
    if suf is not None and in_rv(suf):
        w = w[: -len(suf)]
    return w.replace("I", "i").replace("U", "u")
