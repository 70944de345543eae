"""Classic Porter stemmer (Porter, 1980, "An algorithm for suffix
stripping", Program 14(3) pp 130-137).

This is the exact variant the reference uses (org/terrier/terms/
PorterStemmer.java — Martin Porter's public-domain "Release 4" Java
implementation, including the Bug-1/Bug-2 guards and the k>1 short-word
bypass).  Golden tests in tests/test_porter.py verify term-for-term
equality on the canonical examples (caresses->caress, ponies->poni,
relational->relat, ...).

Words of length <= 2 are returned unchanged (stem() guards `k > 1`).
Non-letter characters (digits, from code tokens) are treated as
consonants, matching the char-switch in cons().
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


class _Stemmer:
    """State: buffer b (list of chars), k = index of last char, j = suffix
    split point set by _ends()."""

    __slots__ = ("b", "k", "j")

    def _cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        # number of vowel-consonant sequences in 0..j: <c><v> -> 0,
        # <c>vc<v> -> 1, <c>vcvc<v> -> 2, ...
        n = 0
        i = 0
        j = self.j
        # skip initial consonant sequence
        while True:
            if i > j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowelinstem(self) -> bool:
        return any(not self._cons(i) for i in range(self.j + 1))

    def _doublec(self, j: int) -> bool:
        if j < 1 or self.b[j] != self.b[j - 1]:
            return False
        return self._cons(j)

    def _cvc(self, i: int) -> bool:
        if i < 2 or not self._cons(i) or self._cons(i - 1) or not self._cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def _ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        if "".join(self.b[o : o + l]) != s:
            return False
        self.j = self.k - l
        return True

    def _setto(self, s: str) -> None:
        o = self.j + 1
        for i, ch in enumerate(s):
            if o + i < len(self.b):
                self.b[o + i] = ch
            else:
                self.b.append(ch)
        self.k = self.j + len(s)

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    # step numbering follows the reference file (step1..step6), which maps
    # to the paper's 1a/1b, 1c, 2, 3, 4, 5a/5b.

    def _step1(self) -> None:
        b = self.b
        if b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies"):
                self._setto("i")
            elif b[self.k - 1] != "s":
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (self._ends("ed") or self._ends("ing")) and self._vowelinstem():
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                self.k -= 1
                if b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step2(self) -> None:
        if self._ends("y") and self._vowelinstem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"),
              ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
              ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def _step3(self) -> None:
        if self.k == 0:  # Bug 1 guard
            return
        for suf, rep in self._STEP3.get(self.b[self.k - 1], ()):
            if self._ends(suf):
                self._r(rep)
                return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def _step4(self) -> None:
        for suf, rep in self._STEP4.get(self.b[self.k], ()):
            if self._ends(suf):
                self._r(rep)
                return

    _STEP5 = {
        "a": ("al",),
        "c": ("ance", "ence"),
        "e": ("er",),
        "i": ("ic",),
        "l": ("able", "ible"),
        "n": ("ant", "ement", "ment", "ent"),
        "s": ("ism",),
        "t": ("ate", "iti"),
        "u": ("ous",),
        "v": ("ive",),
        "z": ("ize",),
    }

    def _step5(self) -> None:
        if self.k == 0:  # Bug 1 guard
            return
        ch = self.b[self.k - 1]
        if ch == "o":
            # -ion only after s/t (Bug 2: j >= 0), else -ou
            if self._ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass
            elif self._ends("ou"):
                pass
            else:
                return
        else:
            sufs = self._STEP5.get(ch)
            if not sufs:
                return
            for suf in sufs:
                if self._ends(suf):
                    break
            else:
                return
        if self._m() > 1:
            self.k = self.j

    def _step6(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self._doublec(self.k) and self._m() > 1:
            self.k -= 1

    def stem(self, word: str) -> str:
        self.b = list(word)
        self.k = len(word) - 1
        if self.k > 1:
            self._step1()
            self._step2()
            self._step3()
            self._step4()
            self._step5()
            self._step6()
        return "".join(self.b[: self.k + 1])


class _TRv2Stemmer(_Stemmer):
    """The reference's TRv2PorterStemmer (org/terrier/terms/
    TRv2PorterStemmer.java, Amati's historical Terrier-v2 Porter
    variant).  Differences from the classic release-4 stemmer, all
    replicated: plural handling requires k > 2 ('gas' stays 'gas',
    classic gives 'ga'); -ed/-ing removal additionally requires a
    consonant in the stem (:263); step 4's -ion handling matches the
    literal suffixes 'tion'/'sion' and removes them WHOLE
    ('adoption' -> 'adop', classic gives 'adopt') (:519-526)."""

    def _consonantinstem(self) -> bool:
        return any(self._cons(i) for i in range(self.j + 1))

    def _step1(self) -> None:
        b = self.b
        if b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies") and self.k > 2:
                self._setto("i")
            elif b[self.k - 1] != "s" and self.k > 2:
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (
            (self._ends("ed") or self._ends("ing"))
            and self._vowelinstem()
            and self._consonantinstem()
        ):
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                self.k -= 1
                if b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step5(self) -> None:
        if self.k == 0:
            return
        ch = self.b[self.k - 1]
        if ch == "o":
            # TRv2 matches the WHOLE 'tion'/'sion' suffix (j = k-4), so
            # m() > 1 removes the t/s along with -ion
            if self._ends("tion") or self._ends("sion") or self._ends("ou"):
                pass
            else:
                return
        else:
            sufs = self._STEP5.get(ch)
            if not sufs:
                return
            for suf in sufs:
                if self._ends(suf):
                    break
            else:
                return
        if self._m() > 1:
            self.k = self.j


class _WeakStemmer(_Stemmer):
    """WeakPorterStemmer.java: step 1 (plurals/-ed/-ing) only."""

    def stem(self, word: str) -> str:
        self.b = list(word)
        self.k = len(word) - 1
        if self.k > 1:
            self._step1()
        return "".join(self.b[: self.k + 1])


class _TRv2WeakStemmer(_TRv2Stemmer):
    """TRv2WeakPorterStemmer.java: TRv2 step1ab + step1c only."""

    def stem(self, word: str) -> str:
        self.b = list(word)
        self.k = len(word) - 1
        if self.k > 1:
            self._step1()
            self._step2()  # classic _step2 == reference step1c (y -> i)
        return "".join(self.b[: self.k + 1])


def _memoized(stemmer: "_Stemmer"):
    cache: dict[str, str] = {}

    def run(word: str) -> str:
        s = cache.get(word)
        if s is None:
            s = stemmer.stem(word)
            if len(cache) < _CACHE_MAX:
                cache[word] = s
        return s

    return run


_STEMMER = _Stemmer()
_CACHE: dict[str, str] = {}
_CACHE_MAX = 1_000_000


def porter_stem(word: str) -> str:
    """Stem one (lowercased) word. Memoized — vocabularies are Zipfian, so
    the cache turns per-token stemming into a dict lookup in the hot path."""
    s = _CACHE.get(word)
    if s is None:
        s = _STEMMER.stem(word)
        if len(_CACHE) < _CACHE_MAX:
            _CACHE[word] = s
    return s


weak_porter_stem = _memoized(_WeakStemmer())
trv2_porter_stem = _memoized(_TRv2Stemmer())
trv2_weak_porter_stem = _memoized(_TRv2WeakStemmer())
