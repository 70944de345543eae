"""Term pipeline: tokenize -> stopword removal -> Porter stemming.

Mirrors the reference's TermPipeline chain (org/terrier/terms/
TermPipeline.java:33-49) with the default chain "Stopwords,PorterStemmer"
(org/terrier/structures/indexing/Indexer.java:275-279).  A stage may drop
a term (Stopwords.java:172-177 drops BEFORE stemming — order matters and
is rank-critical).

The SAME pipeline must be applied to queries at search time
(org/terrier/querying/Manager.java:675-679); `make_pipeline` is that
single shared entry point for both the index build and the query driver,
and the pure-Python oracle calls it too, so any pipeline bug cancels out
of correctness comparisons only if it is also a semantics bug — goldens
in tests/test_pipeline.py pin the semantics independently.
"""

from __future__ import annotations

import functools
import logging

from dataclasses import replace
from typing import Callable, List, Optional

from terrier_spark.config import PipelineConfig
from terrier_spark.text.porter import (
    porter_stem,
    trv2_porter_stem,
    trv2_weak_porter_stem,
    weak_porter_stem,
)
from terrier_spark.text.snowball import snowball_en_stem
from terrier_spark.text.snowball_langs import (
    snowball_de_stem,
    snowball_es_stem,
    snowball_fr_stem,
)
from terrier_spark.text.snowball_nordic import (
    snowball_da_stem,
    snowball_no_stem,
    snowball_sv_stem,
)
from terrier_spark.text.snowball_eastern import (
    snowball_ro_stem,
    snowball_ru_stem,
)
from terrier_spark.text.snowball_finnish import snowball_fi_stem
from terrier_spark.text.snowball_hungarian import snowball_hu_stem
from terrier_spark.text.snowball_turkish import snowball_tr_stem
from terrier_spark.text.snowball_western import (
    snowball_it_stem,
    snowball_nl_stem,
    snowball_pt_stem,
)
from terrier_spark.text.tokenizer import tokenize

# The reference's reflective stemmer surface (terms/*Stemmer.java) as a
# plain registry (SURVEY.md §2.9)
STEMMERS: dict[str, Callable[[str], str]] = {
    "porter": porter_stem,
    "weak_porter": weak_porter_stem,
    "trv2_porter": trv2_porter_stem,
    "trv2_weak_porter": trv2_weak_porter_stem,
    "snowball_en": functools.lru_cache(maxsize=1_000_000)(
        snowball_en_stem
    ),
    "snowball_de": functools.lru_cache(maxsize=1_000_000)(
        snowball_de_stem
    ),
    "snowball_fr": functools.lru_cache(maxsize=1_000_000)(
        snowball_fr_stem
    ),
    "snowball_es": functools.lru_cache(maxsize=1_000_000)(
        snowball_es_stem
    ),
    "snowball_da": functools.lru_cache(maxsize=1_000_000)(
        snowball_da_stem
    ),
    "snowball_no": functools.lru_cache(maxsize=1_000_000)(
        snowball_no_stem
    ),
    "snowball_sv": functools.lru_cache(maxsize=1_000_000)(
        snowball_sv_stem
    ),
    "snowball_nl": functools.lru_cache(maxsize=1_000_000)(
        snowball_nl_stem
    ),
    "snowball_it": functools.lru_cache(maxsize=1_000_000)(
        snowball_it_stem
    ),
    "snowball_pt": functools.lru_cache(maxsize=1_000_000)(
        snowball_pt_stem
    ),
    "snowball_ru": functools.lru_cache(maxsize=1_000_000)(
        snowball_ru_stem
    ),
    "snowball_ro": functools.lru_cache(maxsize=1_000_000)(
        snowball_ro_stem
    ),
    "snowball_fi": functools.lru_cache(maxsize=1_000_000)(
        snowball_fi_stem
    ),
    "snowball_hu": functools.lru_cache(maxsize=1_000_000)(
        snowball_hu_stem
    ),
    "snowball_tr": functools.lru_cache(maxsize=1_000_000)(
        snowball_tr_stem
    ),
}


def resolve_stemmer(cfg: PipelineConfig) -> Optional[Callable[[str], str]]:
    name = cfg.stemmer
    if name is None:
        name = "porter" if cfg.stem else "none"
    if name == "none":
        return None
    try:
        return STEMMERS[name]
    except KeyError:
        raise ValueError(
            f"unknown stemmer {name!r}; available: "
            f"{sorted(STEMMERS) + ['none']}"
        ) from None


# reference terms/*.java class names -> STEMMERS registry keys
_REFERENCE_STAGE_NAMES = {
    "PorterStemmer": "porter",
    "WeakPorterStemmer": "weak_porter",
    "TRv2PorterStemmer": "trv2_porter",
    "TRv2WeakPorterStemmer": "trv2_weak_porter",
    "EnglishSnowballStemmer": "snowball_en",
    "DanishSnowballStemmer": "snowball_da",
    "DutchSnowballStemmer": "snowball_nl",
    "FinnishSnowballStemmer": "snowball_fi",
    "FrenchSnowballStemmer": "snowball_fr",
    "GermanSnowballStemmer": "snowball_de",
    "HungarianSnowballStemmer": "snowball_hu",
    "ItalianSnowballStemmer": "snowball_it",
    "NorwegianSnowballStemmer": "snowball_no",
    "PortugueseSnowballStemmer": "snowball_pt",
    "RomanianSnowballStemmer": "snowball_ro",
    "RussianSnowballStemmer": "snowball_ru",
    "SpanishSnowballStemmer": "snowball_es",
    "SwedishSnowballStemmer": "snowball_sv",
    "TurkishSnowballStemmer": "snowball_tr",
}

_STAGE_LOG = logging.getLogger("terrier_spark.pipeline.dump")


def _resolve_stage(name: str, cfg: PipelineConfig):
    """One named stage -> callable term -> term|None (None = dropped).
    'skip' marks terms that bypass the rest of the chain (the
    reference's SkipTermPipeline.java semantics)."""
    base, _, arg = name.partition(":")
    key = _REFERENCE_STAGE_NAMES.get(base, base.lower())
    if key in ("stopwords",):
        stop = frozenset(cfg.stopwords) if cfg.stopwords else frozenset()
        return ("map", lambda t: None if t in stop else t)
    if key in STEMMERS:
        fn = STEMMERS[key]
        return ("map", fn)
    if key == "noop":
        return ("map", lambda t: t)
    if key == "cropterm":
        n = cfg.max_term_length
        return ("map", lambda t: t[:n])
    if key in ("dumpterm", "dump"):
        def dump(t: str) -> str:
            _STAGE_LOG.info("term %r", t)
            return t
        return ("map", dump)
    if key in ("skiptermpipeline", "skip"):
        skip = frozenset(x for x in arg.split(",") if x)
        return ("skip", skip)
    raise ValueError(
        f"unknown pipeline stage {name!r}; stages: Stopwords, NoOp, "
        f"CropTerm, DumpTerm, SkipTermPipeline:w1,w2, or a stemmer from "
        f"{sorted(STEMMERS)}"
    )


class TermPipeline:
    """Callable: raw text -> list of processed terms (document order kept,
    dropped terms removed — positions are indexes into the KEPT stream,
    as in the reference's block indexing)."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.stop = frozenset(cfg.stopwords) if cfg.stopwords else frozenset()
        self.stem_fn = resolve_stemmer(cfg)
        self.stages = None
        self.crop_overlong = False
        if cfg.stages is not None:
            self.stages = [_resolve_stage(s, cfg) for s in cfg.stages]
            # CropTerm exists to KEEP overlong terms (truncated), so the
            # tokeniser's drop-if-too-long rule is lifted for the chain
            self.crop_overlong = any(
                s.partition(":")[0].lower() == "cropterm"
                for s in cfg.stages
            )

    def _run_stages(self, toks: List[str]) -> List[str]:
        out = []
        for t in toks:
            cur: Optional[str] = t
            for kind, payload in self.stages:
                if kind == "skip":
                    if cur in payload:
                        break  # emitted as-is, rest of chain skipped
                else:
                    cur = payload(cur)
                    if cur is None or cur == "":
                        cur = None
                        break
            if cur is not None:
                out.append(cur)
        return out

    def terms(self, text: str) -> List[str]:
        if self.stages is not None:
            cfg = self.cfg
            if self.crop_overlong:
                cfg = replace(cfg, max_term_length=1 << 30)
            return self._run_stages(tokenize(text, cfg))
        toks = tokenize(text, self.cfg)
        stop = self.stop
        if stop:
            toks = [t for t in toks if t not in stop]
        stem_fn = self.stem_fn
        if stem_fn is not None:
            toks = [stem_fn(t) for t in toks]
        return toks

    __call__ = terms

    def query_terms(self, query: str) -> List[str]:
        """Process a bag-of-words query through the same chain
        (Manager.java:675-679)."""
        return self.terms(query)


_CACHE: dict[tuple, TermPipeline] = {}


def make_pipeline(cfg: Optional[PipelineConfig] = None) -> TermPipeline:
    cfg = cfg or PipelineConfig()
    key = cfg.key()
    pipe = _CACHE.get(key)
    if pipe is None:
        pipe = _CACHE[key] = TermPipeline(cfg)
    return pipe


def load_stopwords(path: str) -> tuple[str, ...]:
    """Reference stopword file format: one word per line, '#' comments
    ignored (org/terrier/terms/Stopwords.java:118-149)."""
    words = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            w = line.strip()
            if w and not w.startswith("#"):
                words.append(w.lower())
    return tuple(words)
