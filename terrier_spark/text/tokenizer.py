"""Terrier-style English tokenizer.

Behavioral contract (org/terrier/indexing/tokenisation/EnglishTokeniser.java):

* tokens are maximal runs of [A-Za-z0-9] (:104-140);
* a token longer than max_term_length (default 20) is DROPPED, not
  truncated (:125-131, DROP_LONG_TOKENS=true);
* the validity check runs on the RAW (pre-lowercase) token (:155-181):
    - more than `max_digits` (4) digit characters anywhere -> dropped;
    - more than `max_conseq` (3) consecutive IDENTICAL characters
      (case-sensitive comparison) -> dropped;
* surviving tokens are lowercased (lowercase=true default).

Implemented with compiled regexes so per-document work is C-level; the
Spark entry point is an Arrow pandas UDF wrapping `tokenize` row-wise
over a batch (terrier_spark/index/builder.py).
"""

from __future__ import annotations

import re
from typing import List

from terrier_spark.config import PipelineConfig

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def _conseq_re(max_conseq: int) -> re.Pattern:
    # matches max_conseq+1 consecutive identical chars (case-sensitive)
    return re.compile(r"(.)\1{%d}" % max_conseq)


def _digits_re(max_digits: int) -> re.Pattern:
    # matches iff the string contains more than max_digits digit chars
    return re.compile(r"(?:[^0-9]*[0-9]){%d}" % (max_digits + 1))


_DEFAULT = PipelineConfig()
_DEFAULT_CONSEQ = _conseq_re(_DEFAULT.max_conseq)
_DEFAULT_DIGITS = _digits_re(_DEFAULT.max_digits)


def check_term(s: str, cfg: PipelineConfig = _DEFAULT) -> str:
    """Port of EnglishTokeniser.check (:155-181): return '' if invalid,
    else the (lowercased) term."""
    if len(s) > cfg.max_term_length:
        return ""
    if cfg is _DEFAULT:
        digits, conseq = _DEFAULT_DIGITS, _DEFAULT_CONSEQ
    else:
        digits, conseq = _digits_re(cfg.max_digits), _conseq_re(cfg.max_conseq)
    if digits.match(s) or conseq.search(s):
        return ""
    return s.lower() if cfg.lowercase else s


# UTFTokeniser.java: token chars are the Unicode letter-or-digit classes
# (Character.isLetterOrDigit) PLUS combining marks (Character.getType in
# {NON_SPACING_MARK, COMBINING_SPACING_MARK}), which Python's \w
# excludes — build the Mn/Mc class once, lazily, from unicodedata.
_UTF_TOKEN_RE = None
# UTFTwitterTokeniser.java:85-100: same classes plus '/' and '@' so
# mentions (@user) and URL paths survive as single tokens
_UTF_TWITTER_RE = None


def _mark_ranges() -> str:
    import sys
    import unicodedata

    ranges, start, prev = [], None, None
    for cp in range(sys.maxunicode + 1):
        if unicodedata.category(chr(cp)) in ("Mn", "Mc"):
            if start is None:
                start = cp
            prev = cp
        elif start is not None:
            ranges.append((start, prev))
            start = None
    if start is not None:
        ranges.append((start, prev))
    return "".join(
        re.escape(chr(a)) if a == b
        else f"{re.escape(chr(a))}-{re.escape(chr(b))}"
        for a, b in ranges
    )


def _utf_res() -> tuple[re.Pattern, re.Pattern]:
    global _UTF_TOKEN_RE, _UTF_TWITTER_RE
    if _UTF_TOKEN_RE is None:
        marks = _mark_ranges()
        _UTF_TOKEN_RE = re.compile(r"(?:[^\W_]|[%s])+" % marks)
        _UTF_TWITTER_RE = re.compile(r"(?:[^\W_]|[%s/@])+" % marks)
    return _UTF_TOKEN_RE, _UTF_TWITTER_RE


def tokenize(text: str, cfg: PipelineConfig = _DEFAULT) -> List[str]:
    """text -> list of valid (lowercased) terms, in document order.
    Tokeniser variant per cfg.tokeniser: english / utf / utf_twitter /
    identity."""
    if not text:
        return []
    tokeniser = getattr(cfg, "tokeniser", "english")
    if tokeniser == "identity":
        # IdentityTokeniser.java: the whole input is one token, unchecked
        return [text.lower() if cfg.lowercase else text]
    if tokeniser == "utf":
        token_re = _utf_res()[0]
    elif tokeniser == "utf_twitter":
        token_re = _utf_res()[1]
    elif tokeniser == "english":
        token_re = _TOKEN_RE
    else:
        raise ValueError(
            f"unknown tokeniser {tokeniser!r}; available: english, utf, "
            "utf_twitter, identity"
        )
    out = []
    append = out.append
    if cfg is _DEFAULT:
        max_len, digits, conseq = _DEFAULT.max_term_length, _DEFAULT_DIGITS, _DEFAULT_CONSEQ
        lower = _DEFAULT.lowercase
    else:
        max_len = cfg.max_term_length
        digits, conseq = _digits_re(cfg.max_digits), _conseq_re(cfg.max_conseq)
        lower = cfg.lowercase
    for tok in token_re.findall(text):
        if len(tok) > max_len or digits.match(tok) or conseq.search(tok):
            continue
        append(tok.lower() if lower else tok)
    return out
