"""Turkish Snowball stemmer, implemented from the published algorithm
(snowballstem.org/algorithms/turkish/stemmer.html, E. Kapusuz Çilden's
algorithm — behind the org.tartarus program the reference wraps in
TurkishSnowballStemmer.java).

Turkish is agglutinative: the stemmer strips one layer of nominal-verb
suffixes, then iterates noun (possessive/case) suffixes.  Every suffix
carries vowel-harmony constraints (A = a/e, U = ı/i/u/ü harmonising
with the last stem vowel in frontness and, for U, roundedness) and
optional buffer consonants (y/n/s) that are only part of the suffix
when a vowel precedes them.  After stripping, a final voiced stop is
restored to its unvoiced form (b/c/d/ğ -> p/ç/t/k) and anything after
an apostrophe (proper-noun clitics) is dropped first.

Reconstructed from the published description with hand-traced goldens;
the reference contains only a 42-line language-name wrapper.
"""

from __future__ import annotations

from typing import Optional

_TR_VOWELS = frozenset("aeıioöuü")
_TR_FRONT = frozenset("eiöü")   # front vowels harmonise with e/i/ö/ü
_TR_ROUND = frozenset("oöuü")


def _last_vowel(w: str) -> Optional[str]:
    for c in reversed(w):
        if c in _TR_VOWELS:
            return c
    return None


def _harmonic_A(prev: Optional[str]) -> str:
    return "e" if prev in _TR_FRONT else "a"


def _harmonic_U(prev: Optional[str]) -> str:
    if prev is None:
        return "i"
    front = prev in _TR_FRONT
    rnd = prev in _TR_ROUND
    return {(False, False): "ı", (False, True): "u",
            (True, False): "i", (True, True): "ü"}[(front, rnd)]


def _strip(w: str, pattern: str, mode: str = "any") -> Optional[str]:
    """Try to strip one suffix described by `pattern` from w.

    Pattern letters: 'A' = harmonising a/e, 'U' = harmonising ı/i/u/ü,
    'D' = d/t, '(x)' = optional buffer letter x; lowercase letters match
    literally.  Buffer validity is two-sided, per the published rules
    ("the y/n/s consonants are only present after vowels", and the U
    connector only after consonants): when the buffer is PRESENT the
    stem must end the licensing way, and when it is ABSENT the stem
    must end the opposite way — otherwise bare ``lA`` would strip a
    dative ``okul+a`` as instrumental ``oku+la``.

    `mode` selects which forms are eligible: "buffered" tries only the
    buffer-present form (and plain patterns), "bare" only the
    buffer-absent form of optional patterns, "any" prefers buffered.
    Returns the stem or None.  Harmony is checked against the last
    vowel of the REMAINING stem, per the published algorithm.
    """
    optional = pattern.startswith("(")
    if optional:
        close = pattern.index(")")
        buf = pattern[1:close]
        rest = pattern[close + 1:]
        if mode in ("any", "buffered"):
            got = _strip(w, buf + rest)
            if got is not None and got:
                # consonant buffers (y/n/s) attach after a vowel; the
                # vowel connector (U) attaches after a consonant
                want_vowel_before = buf != "U"
                if (got[-1] in _TR_VOWELS) == want_vowel_before:
                    return got
        if mode in ("any", "bare"):
            got = _strip(w, rest)
            if got is not None and got:
                # complementary side: an absent buffer implies the stem
                # ends the other way
                want_vowel_before = buf == "U"
                if (got[-1] in _TR_VOWELS) == want_vowel_before:
                    return got
        return None
    if mode == "bare":
        return None  # plain patterns are fully tried in the buffered pass

    n = len(pattern)
    if len(w) <= n:
        return None
    stem, tail = w[:-n], w[-n:]
    # harmony is ADJACENT-syllable: each suffix vowel harmonises with
    # the nearest vowel to its left (stem's last vowel for the first
    # suffix vowel, then each accepted suffix vowel in turn)
    prev = _last_vowel(stem)
    for pc, tc in zip(pattern, tail):
        if pc == "A":
            if tc != _harmonic_A(prev):
                return None
        elif pc == "U":
            if tc != _harmonic_U(prev):
                return None
        elif pc == "D":
            if tc not in "dt":
                return None
        elif tc != pc:
            return None
        if tc in _TR_VOWELS:
            prev = tc
    return stem


# one layer of nominal verb suffixes (longest/most-specific first);
# the bare person endings -m/-n/-k of the full algorithm are omitted:
# without the preceding-tense context the algorithm tracks, they
# over-strip noun stems
_TR_NOMINAL_VERB = [
    "cAsUnA", "sUnUz", "(y)mUş", "(y)ken", "(y)DU", "(y)sA", "sUn",
    "(y)Uz", "(y)Um", "nUz", "DUr", "lAr",
]

# noun suffixes by morphotactic class, stripped outside-in: at most one
# case ending, then possessives, then the plural ('ki' re-opens the
# chain: evdeki -> ki -> DA -> ev).  lArU combines plural+3sg
# possessive, so it consumes both inner stages.
_TR_CASE = [
    "nDAn", "(y)lA", "(n)Un", "nDA", "DAn", "ki", "nU", "nA", "DA",
    "(n)cA", "(y)U", "(y)A",
]
_TR_POSS = ["lArU", "(U)mUz", "(U)nUz", "(s)U", "(U)m", "(U)n"]
_TR_PLURAL = ["lAr"]

_TR_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def snowball_tr_stem(word: str) -> str:
    w = word
    # proper-noun clitics: drop the apostrophe and everything after it
    for apo in ("'", "’"):
        if apo in w:
            w = w.split(apo, 1)[0]
    if sum(c in _TR_VOWELS for c in w) < 2:
        return w  # single-syllable words are left alone

    # one nominal-verb layer
    for pat in _TR_NOMINAL_VERB:
        got = _strip(w, pat)
        if got is not None and any(c in _TR_VOWELS for c in got):
            w = got
            break

    # noun suffixes: case -> possessive -> plural, one strip per stage.
    # Each stage runs two passes: buffer-present forms first (they bind
    # tighter — ``arabası`` is araba+sı, never arabas+ı), bare forms
    # second.  The case pass additionally tries the buffered possessive
    # ``sU`` (a vowel-final stem followed by harmonic sU is always the
    # possessive), which consumes the possessive stage when it fires.
    stage = 0
    while stage < 3 and sum(c in _TR_VOWELS for c in w) >= 2:
        stages = (_TR_CASE, _TR_POSS, _TR_PLURAL)
        hit = None
        for mode in ("buffered", "bare"):
            pats = list(stages[stage])
            if stage == 0 and mode == "buffered":
                pats.append("POSS_SU")
            for pat in pats:
                real = "(s)U" if pat == "POSS_SU" else pat
                got = _strip(w, real, mode=mode)
                if got is None or not any(c in _TR_VOWELS for c in got):
                    continue
                if pat == "ki" and not got.endswith(
                    ("da", "de", "ta", "te")
                ):
                    continue
                hit = (pat, got)
                break
            if hit is not None:
                break
        if hit is None:
            stage += 1
            continue
        pat, w = hit
        if pat == "ki":
            stage = 0        # the -DAki chain re-opens case stripping
        elif pat in ("lArU", "POSS_SU"):
            stage = 3 if pat == "lArU" else 2  # possessive consumed
        else:
            stage += 1

    # restore the devoiced final stop
    if w and w[-1] in _TR_DEVOICE:
        w = w[:-1] + _TR_DEVOICE[w[-1]]
    return w
