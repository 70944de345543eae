"""Text-analysis operators: token counting, quality scoring, language
identification, document fingerprinting.  All pure Column expressions
(JVM-side, whole-stage codegen) — no UDFs — so they run at scan speed
over 100 TB and are mirrored exactly by the DuckDB gate oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Function-word marker lexicons (~100 public high-frequency closed-class
# words per language) for the 11 languages the engine also ships
# stemmers for — see datapipe/langwords.py.
from terrier_spark.datapipe.langwords import FUNCTION_WORDS as LANG_STOPWORDS

# `quality_scores`' stopword-ratio feature keeps its original compact
# English list so the quality thresholds stay calibrated independently
# of language-ID lexicon growth.
EN_QUALITY_STOPS = (
    "the", "and", "of", "to", "in", "is", "it", "for", "with", "that",
)

# BPE-ish subword pieces: letter runs, digit runs, or single non-space
# symbols — a public approximation of byte-pair pretokenization
BPE_ISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
WS_RE = "\\S+"
PUNCT_RE = "[^A-Za-z0-9\\s]"


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """-> (id, n_ws_tokens, n_subword_tokens, n_chars)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.regexp_extract_all(t, F.lit(WS_RE), 0)).cast("long")
        .alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_RE), 0)).cast("long")
        .alias("n_subword_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_tokens: int = 10,
                   max_punct_ratio: float = 0.3) -> DataFrame:
    """Heuristic document-quality features + keep flag
    -> (id, n_chars, n_tokens, punct_ratio, stopword_ratio, keep)."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    toks = F.regexp_extract_all(F.lower(t), F.lit(WS_RE), 0)
    n_tokens = F.size(toks).cast("long")
    n_punct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_RE), 0)).cast("long")
    en_stops = F.array(*[F.lit(w) for w in EN_QUALITY_STOPS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(en_stops, x)))
    punct_ratio = F.round(
        n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"), 6
    )
    stop_ratio = F.round(
        n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double"), 6
    )
    keep = (n_tokens >= min_tokens) & (punct_ratio <= max_punct_ratio)
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        keep.alias("keep"),
    )


LETTER_RUN_RE = "[\\p{L}]+"


def language_id(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Function-word-hit language ID -> (id, lang_guess, hits).  Argmax
    of per-language marker-word hits over LETTER-RUN tokens (so
    punctuation-attached words like "the," still match — \\S+ missed
    them); ties broken by language code ascending; zero hits -> 'und'.
    Pure Columns end to end: at 100 TB this is a scan-speed argmax over
    11 array_contains filters, no UDF, no shuffle."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(LETTER_RUN_RE), 0
    )
    cols = []
    for lang in sorted(LANG_STOPWORDS):
        arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        cols.append(
            F.struct(
                (-F.size(F.filter(toks, lambda x: F.array_contains(arr, x))))
                .cast("long").alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax with deterministic tie-break: ascending sort on
    # (neg_hits, lang) = (hits desc, lang asc)
    best = F.sort_array(F.array(*cols))[0]
    out = df.select(
        F.col(id_col).alias("id"),
        best["lang"].alias("lang_guess_raw"),
        (-best["neg_hits"]).alias("hits"),
    )
    return out.select(
        "id",
        F.when(F.col("hits") > 0, F.col("lang_guess_raw"))
        .otherwise(F.lit("und")).alias("lang_guess"),
        "hits",
    )


def language_id_trigram(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Character-trigram language ID -> (id, lang_guess, tri_llk): argmax
    of the mean per-trigram log-likelihood under per-language trigram
    profiles DERIVED from the function-word lexicons
    (langwords.trigram_logprobs — same public data as language_id, no
    external corpora).  Catches what the lexicon vote cannot: short or
    code-mixed documents with zero function-word hits still have
    orthographic trigram signal (German 'sch', Spanish 'ción', Finnish
    'ää').  One Arrow-batched kernel; trigram counting is a dict walk
    over letter runs, everything else numpy.  Ties break lang ascending;
    docs with no letters -> 'und'.  tri_llk is rounded to 6 dp so the
    DuckDB oracle's different summation order cannot flip the hash."""
    import re

    import pandas as pd
    from typing import Iterator

    from terrier_spark.datapipe.langwords import (
        _word_trigrams,
        trigram_logprobs,
    )

    logp, floor = trigram_logprobs()
    langs = sorted(logp)
    word_re = re.compile(r"[^\W\d_]+", re.UNICODE)

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids, guesses, llks = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                counts: dict = {}
                for w in word_re.findall((text or "").lower()):
                    for t in _word_trigrams(w):
                        counts[t] = counts.get(t, 0) + 1
                n = sum(counts.values())
                ids.append(rid)
                if n == 0:
                    guesses.append("und")
                    llks.append(None)
                    continue
                best_lang, best_llk = None, None
                for lang in langs:
                    prof, fl = logp[lang], floor[lang]
                    s = sum(
                        c * prof.get(t, fl) for t, c in counts.items()
                    )
                    mean = s / n
                    if best_llk is None or mean > best_llk:
                        best_lang, best_llk = lang, mean
                guesses.append(best_lang)
                llks.append(round(best_llk, 6))
            yield pd.DataFrame(
                {"id": ids, "lang_guess": guesses,
                 "tri_llk": pd.array(llks, dtype="float64")}
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(
        run, schema="id long, lang_guess string, tri_llk double"
    )


def language_id_combined(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Lexicon-first language ID with a trigram fallback: the
    function-word argmax decides whenever at least one marker word hit
    (high precision); zero-hit documents (short text, code comments,
    named entities) fall back to the trigram profile instead of 'und'.
    -> (id, lang_guess, hits, tri_llk, source)."""
    words = language_id(df, id_col, text_col)
    tri = language_id_trigram(df, id_col, text_col).withColumnRenamed(
        "lang_guess", "tri_guess"
    )
    return (
        words.join(tri, "id")
        .select(
            "id",
            F.when(F.col("hits") > 0, F.col("lang_guess"))
            .when(F.col("tri_llk").isNotNull(), F.col("tri_guess"))
            .otherwise(F.lit("und")).alias("lang_guess"),
            "hits", "tri_llk",
            F.when(F.col("hits") > 0, F.lit("lexicon"))
            .when(F.col("tri_llk").isNotNull(), F.lit("trigram"))
            .otherwise(F.lit("none")).alias("source"),
        )
    )


# the Gopher quality-rule stop set (Rae et al. 2021, §A.1.1: a document
# must contain at least two of these)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0,
                   max_symbol_ratio: float = 0.1,
                   max_bullet_frac: float = 0.9,
                   max_ellipsis_frac: float = 0.3,
                   min_alpha_frac: float = 0.8,
                   min_stop_hits: int = 2) -> DataFrame:
    """The published Gopher quality rules (Rae et al. 2021, table A1) as
    pure JVM Columns -> (id, n_words, mean_word_len, symbol_ratio,
    bullet_frac, ellipsis_frac, alpha_word_frac, stop_hits, keep).

    Rules: word count in [min_words, max_words]; mean word length in
    [3, 10]; '#'/ellipsis symbols per word <= 0.1; <= 90% of lines
    bullet-started; <= 30% of lines ellipsis-ended; >= 80% of words
    contain a letter; >= 2 of the required stop words present.  The
    default thresholds are the paper's."""
    t = F.col(text_col)
    words = F.regexp_extract_all(t, F.lit(WS_RE), 0)
    n_words = F.size(words).cast("long")
    nw1 = F.greatest(n_words, F.lit(1)).cast("double")
    word_chars = F.length(F.concat_ws("", words)).cast("double")
    mean_wl = F.round(word_chars / nw1, 6)
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_ell = (
        (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", "")))
        / F.lit(3)
    ).cast("long") + (
        F.length(t) - F.length(F.regexp_replace(t, "…", ""))
    )
    symbol_ratio = F.round((n_hash + n_ell).cast("double") / nw1, 6)
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_lines = F.size(F.filter(
        lines,
        lambda ln: ln.startswith("•") | ln.startswith("- ")
        | ln.startswith("* "),
    ))
    bullet_frac = F.round(bullet_lines.cast("double") / n_lines, 6)
    ell_lines = F.size(F.filter(
        lines, lambda ln: ln.endswith("...") | ln.endswith("…")
    ))
    ellipsis_frac = F.round(ell_lines.cast("double") / n_lines, 6)
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.round(alpha_words.cast("double") / nw1, 6)
    lw = F.regexp_extract_all(F.lower(t), F.lit(WS_RE), 0)
    stop_hits = sum(
        F.array_contains(lw, s).cast("int") for s in GOPHER_STOPS
    ).cast("long")
    keep = (
        (n_words >= min_words) & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


def repetition_scores(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_dup_line_frac: float = 0.30,
                      max_dup_line_char_frac: float = 0.20,
                      max_top_2gram_char_frac: float = 0.20) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021, table A1 second half)
    -> (id, dup_line_frac, dup_line_char_frac, top_2gram_char_frac,
    keep).  Definitions (public implementations vary; these are pinned
    and mirrored by the SQL oracle):

      dup_line_frac       repeated occurrences of a non-empty trimmed
                          line (count - 1 per distinct line) / total
                          non-empty lines
      dup_line_char_frac  characters in those repeated occurrences /
                          characters in all non-empty lines
      top_2gram_char_frac characters covered by the most frequent word
                          2-gram (count * gram length) / characters in
                          all words; the top gram is (count desc, gram
                          asc) so ties are deterministic.  Overlapping
                          occurrences each count their full gram length,
                          so a degenerate "x y x y ..." doc can score
                          above 1.0 — fine for thresholding, as in the
                          public implementations

    Scale shape: explode -> partial-agg groupBy keyed by (id, line) /
    (id, gram) -> per-id agg — no per-doc quadratic array work, safe for
    100k-line documents."""
    t = F.col(text_col)
    base = df.select(F.col(id_col).alias("id"), t.alias("__text"))

    lines = base.select(
        "id",
        F.explode(
            F.filter(
                F.transform(F.split(F.col("__text"), "\n"),
                            lambda ln: F.trim(ln)),
                lambda ln: ln != "",
            )
        ).alias("line"),
    )
    line_counts = lines.groupBy("id", "line").agg(
        F.count("*").alias("cnt"), F.length("line").alias("chars")
    )
    line_feats = line_counts.groupBy("id").agg(
        F.sum("cnt").alias("n_lines"),
        F.sum(F.col("cnt") - 1).alias("dup_lines"),
        F.sum(F.col("cnt") * F.col("chars")).alias("line_chars"),
        F.sum((F.col("cnt") - 1) * F.col("chars")).alias("dup_line_chars"),
    )

    words = F.regexp_extract_all(F.lower(F.col("__text")), F.lit(WS_RE), 0)
    grams = base.select(
        "id",
        F.length(F.concat_ws("", words)).alias("word_chars"),
        F.explode_outer(
            F.zip_with(
                F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
                F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("gram"),
    )
    per_gram = (
        grams.filter(F.col("gram").isNotNull())
        .groupBy("id", "word_chars", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    # deterministic top gram: max cnt, then min gram among ties
    max_cnt = per_gram.groupBy("id", "word_chars").agg(
        F.max("cnt").alias("max_cnt")
    )
    top = (
        per_gram.join(max_cnt, ["id", "word_chars"])
        .filter(F.col("cnt") == F.col("max_cnt"))
        .groupBy("id", "word_chars", "max_cnt")
        .agg(F.min("gram").alias("top_gram"))
        .select(
            "id",
            (
                F.col("max_cnt") * F.length("top_gram")
            ).cast("double").alias("top_covered"),
            F.col("word_chars").cast("double").alias("word_chars"),
        )
    )

    out = (
        df.select(F.col(id_col).alias("id"))
        .join(line_feats, "id", "left")
        .join(top, "id", "left")
        .select(
            "id",
            F.round(
                F.coalesce(F.col("dup_lines"), F.lit(0)).cast("double")
                / F.greatest(F.coalesce(F.col("n_lines"), F.lit(0)),
                             F.lit(1)).cast("double"),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.coalesce(F.col("dup_line_chars"), F.lit(0)).cast("double")
                / F.greatest(F.coalesce(F.col("line_chars"), F.lit(0)),
                             F.lit(1)).cast("double"),
                6,
            ).alias("dup_line_char_frac"),
            F.round(
                F.coalesce(F.col("top_covered"), F.lit(0.0))
                / F.greatest(F.coalesce(F.col("word_chars"), F.lit(0.0)),
                             F.lit(1.0)),
                6,
            ).alias("top_2gram_char_frac"),
        )
        .withColumn(
            "keep",
            (F.col("dup_line_frac") <= max_dup_line_frac)
            & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
            & (F.col("top_2gram_char_frac") <= max_top_2gram_char_frac),
        )
    )
    return out


# PII patterns (kept RE2-compatible — no backreferences/lookaround — so
# the DuckDB oracle runs the identical regexes)
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_RE = (
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
)
# optional +country, then three separator-joined digit groups (2-4/3-4/
# 3-4) — covers 555 987 6543, (555) 123-4567, 020-7946-0958 shapes;
# dotted IPs are already masked by the preceding IP pass
PII_PHONE_RE = (
    "(?:\\+?[0-9]{1,3}[-. ])?"
    "\\(?[0-9]{2,4}\\)?[-. ][0-9]{3,4}[-. ][0-9]{3,4}\\b"
)


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Standard training-data PII redaction: mask emails, IPv4 addresses
    and phone numbers with typed placeholder tokens, and count the
    replacements -> (id, scrubbed, n_emails, n_ips, n_phones).  Pure JVM
    regexp columns; the masks are the common <|email|>-style sentinels
    so downstream tokenizers see a single token per redaction.  Order is
    pinned (emails, then IPs, then phones on the already-masked text) —
    the oracle mirrors it."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0))
    step1 = F.regexp_replace(t, PII_EMAIL_RE, "<|email|>")
    n_ips = F.size(F.regexp_extract_all(step1, F.lit(PII_IPV4_RE), 0))
    step2 = F.regexp_replace(step1, PII_IPV4_RE, "<|ip|>")
    n_phones = F.size(F.regexp_extract_all(step2, F.lit(PII_PHONE_RE), 0))
    step3 = F.regexp_replace(step2, PII_PHONE_RE, "<|phone|>")
    return df.select(
        F.col(id_col).alias("id"),
        step3.alias("scrubbed"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
    )


def char_fingerprints(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", gram: int = 8) -> DataFrame:
    """Rolling-hash document fingerprint: minimum 60-bit md5-int over all
    character `gram`-grams (winnowing's min-selection at window = whole
    doc) -> (id, fingerprint).  Docs shorter than `gram` hash the whole
    text."""
    t = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (gram - 1), F.lit(1))),
        lambda i: F.conv(
            F.substring(F.md5(F.substring(t, i, gram)), 1, 15), 16, 10
        ).cast("long"),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_min(grams).alias("fingerprint"),
    )
