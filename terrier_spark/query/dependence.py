"""MRF dependence (term-proximity) scoring — SD and FD, DFR and
Dirichlet-LM (MRF) pair-score variants.

Replicates the reference's dependence score modifiers
(matching/dsms/DependenceScoreModifier.java:216-360,
DFRDependenceScoreModifier.scoreFDSD :91-118,
MRFDependenceScoreModifier.scoreFDSD :70-75):

  * SD (sequential dependence): for each ADJACENT query-term pair
    (i, i+1), matchingNGrams counts positions p1 of term i with
    p1 + window <= doclen whose FIRST term-(i+1) position p2 >= p1
    satisfies p2 - p1 < window (utility/Distance.noTimesSameOrder
    :255-283; window = proximity.ngram.length = 2);
  * FD (full dependence): for EVERY query-term pair (i, j), i < j,
    matchingNGrams counts sliding windows [w, w+window) of the document
    (numberOfNGrams = dl < window ? 1 : dl - window + 1) containing both
    terms in any order (utility/Distance.noTimes :82-106 via
    windowsForTerms :176-195);
  * pair score (norm2 on, c = proximity.norm2.c = 1):
      nw    = doclen < window ? 1 : doclen - window + 1
      pfn   = m * log2(1 + c*avgdl/nw)
      bg    = avgdl; p = 1/bg; q = 1 - p
      s     = [ -lgamma(bg+1) + lgamma(pfn+1) + lgamma(bg-pfn+1) ] / ln2
              - pfn*log2(p) - (bg-pfn)*log2(q)
      score = s / (1 + pfn)
  * MRF variant (MRFDependenceScoreModifier.java:70-75, Metzler &
    Croft SIGIR'05 via Ivory's constant-cf simplification :35-38):
      score = w_o * ( log2(1 + m / (mu * defaultCf / numTokens))
                      + log2(mu / (dl + mu)) )
    with mu = mrf.mu = 4000, defaultCf = 2 * numDocs/100 (:86-87).
    Unlike DFR (which returns 0 at m == 0,
    DFRDependenceScoreModifier.java:91-92), MRF scores EVERY doc where
    both pair terms occur — the m == 0 length penalty
    log2(mu/(dl+mu)) applies (the parent calls scoreFDSD
    unconditionally once okToUse holds for the pair, :330,:362).
    Note the reference multiplies the internal w_o (:74, re-read in
    setCollectionStatistics :83-84) AND the outer w_o/w_u (:332,:363)
    — w_o^2 for SD with defaults; replicated faithfully.
  * avgdl is the parent's ngram-adjusted value
    (setCollectionStatistics :393-397):
      avgDocLen = (numTokens - numDocs * (window - 1)) / numDocs
  * final doc score = w_t * base + sum over pairs of
    qtw_comb * (w_o for SD / w_u for FD) * score  (qtw fnid 1: mean of
    the two term weights); docs whose base score is <= 0 are left
    unmodified (:260-262).

Plan shape: positions stay PACKED as per-posting arrays; the pair
counting runs as a numpy kernel on the joined (pos_a, pos_b) arrays per
candidate doc — no per-position row explosion or shuffle.
Requires a positional index (IndexConfig.positions=True).
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from terrier_spark.config import QueryConfig
from terrier_spark.index.store import IndexStore
from terrier_spark.query.positional import posting_positions
from terrier_spark.query.search import _topk, process_queries, search_terms
from terrier_spark.text.pipeline import make_pipeline

NGRAM_LENGTH = 2
LN2 = math.log(2.0)


def sd_pair_score(m: float, dl: float, avgdl: float,
                  window: int = NGRAM_LENGTH, c: float = 1.0) -> float:
    """DFRDependenceScoreModifier.scoreFDSD with norm2 (the default)."""
    if m == 0:
        return 0.0
    nw = 1.0 if 0 < dl < window else dl - window + 1.0
    pfn = m * math.log2(1.0 + c * avgdl / nw)
    bg = avgdl
    p = 1.0 / bg
    q = 1.0 - p
    s = (
        (-math.lgamma(bg + 1.0) + math.lgamma(pfn + 1.0)
         + math.lgamma(bg - pfn + 1.0)) / LN2
        - pfn * math.log2(p)
        - (bg - pfn) * math.log2(q)
    )
    return s / (1.0 + pfn)


def mrf_pair_score(m: float, dl: float, num_tokens: float,
                   num_docs: float, mu: float = 4000.0,
                   w_o: float = 1.0) -> float:
    """MRFDependenceScoreModifier.scoreFDSD (:70-75): Dirichlet-LM pair
    score with Ivory's constant collection tuple frequency
    defaultCf = 2 * (numDocs / 100) (:86-87).  Valid for m >= 0 — the
    m == 0 case contributes the pure length penalty log2(mu/(dl+mu))."""
    default_cf = 2.0 * (num_docs / 100.0)
    return w_o * (
        math.log2(1.0 + m / (mu * (default_cf / num_tokens)))
        + math.log2(mu / (dl + mu))
    )


def count_same_order(pa: np.ndarray, pb: np.ndarray, window: int,
                     dl: int) -> int:
    """Distance.noTimesSameOrder: #p1 with p1 + window <= dl whose first
    p2 >= p1 is within (p1, p1 + window)."""
    if pa.size == 0 or pb.size == 0 or window < 2:
        return 0
    pa = pa[pa + window <= dl]
    if pa.size == 0:
        return 0
    idx = np.searchsorted(pb, pa, side="left")
    ok = idx < pb.size
    first = pb[np.minimum(idx, pb.size - 1)]
    return int(np.count_nonzero(ok & (first - pa < window)))


def count_unordered(pa: np.ndarray, pb: np.ndarray, window: int,
                    dl: int) -> int:
    """Distance.noTimes: #sliding windows of the doc containing both
    terms.  A position a covers windows max(0, a-window+1)..min(a, n-1),
    n = dl < window ? 1 : dl - window + 1 (windowsForTerms semantics)."""
    if pa.size == 0 or pb.size == 0:
        return 0
    n = 1 if dl < window else dl - window + 1

    def covered(pos: np.ndarray) -> np.ndarray:
        starts = np.clip(pos - window + 1, 0, None)
        ends = np.minimum(pos, n - 1)
        valid = starts <= ends
        diff = np.zeros(n + 1, dtype=np.int64)
        np.add.at(diff, starts[valid], 1)
        np.add.at(diff, ends[valid] + 1, -1)
        return np.cumsum(diff[:-1]) > 0

    return int(np.count_nonzero(covered(pa) & covered(pb)))


def _qtw_combine(w1: float, w2: float, fnid: int) -> float:
    """DependenceScoreModifier.java qtw combination functions."""
    if fnid == 1:
        return 0.5 * w1 + 0.5 * w2
    if fnid == 2:
        return w1 * w2
    if fnid == 3:
        return min(w1, w2)
    if fnid == 4:
        return max(w1, w2)
    return 1.0


def search_with_dependence(
    spark: SparkSession,
    store: IndexStore,
    queries: Sequence[Tuple[str, str]],
    qcfg: Optional[QueryConfig] = None,
    dependency: str = "SD",
    window: int = NGRAM_LENGTH,
    w_t: float = 1.0,
    w_o: float = 1.0,
    w_u: float = 1.0,
    ngram_c: float = 1.0,
    qtw_fnid: int = 1,
    variant: str = "DFR",
    mrf_mu: float = 4000.0,
) -> DataFrame:
    """Retrieval with the SD or FD proximity modifier
    -> (qid, rank, docid, score).

    variant "DFR" = DFRDependenceScoreModifier (binomial randomness),
    variant "MRF" = MRFDependenceScoreModifier (Dirichlet LM, mu =
    mrf_mu; internal w_o applied per the reference)."""
    if dependency not in ("SD", "FD"):
        raise ValueError("dependency must be 'SD' or 'FD'")
    if variant not in ("DFR", "MRF"):
        raise ValueError("variant must be 'DFR' or 'MRF'")
    qcfg = qcfg or QueryConfig()
    num_docs = float(store.stats["num_docs"])
    num_tokens = float(store.stats["num_tokens"])
    # DependenceScoreModifier.setCollectionStatistics (:393-397):
    # ngram-adjusted average document length
    avgdl = (num_tokens - num_docs * (window - 1)) / num_docs

    qterms = process_queries(queries, store.pipeline_config())
    scored = search_terms(
        spark, store, qterms, replace(qcfg, k=1 << 31)
    ).select("qid", "docid", "score")

    # term pairs in first-occurrence pipeline order (the reference's
    # MatchingQueryTerms term-addition order): adjacent for SD, all
    # (i, j) i < j for FD (DependenceScoreModifier.java:303-357)
    pipe = make_pipeline(store.pipeline_config())
    pair_rows = []
    pid = 0
    pair_w = w_o if dependency == "SD" else w_u
    for qid, text in queries:
        seen: list[str] = []
        counts: dict[str, int] = {}
        for t in pipe.query_terms(text):
            if t not in counts:
                seen.append(t)
            counts[t] = counts.get(t, 0) + 1
        if dependency == "SD":
            combos = list(zip(seen, seen[1:]))
        else:
            combos = [
                (seen[i], seen[j])
                for i in range(len(seen))
                for j in range(i + 1, len(seen))
            ]
        for a, b in combos:
            if a == b:
                continue  # distinct position arrays required
            qtw = _qtw_combine(counts[a], counts[b], qtw_fnid)
            pair_rows.append((str(qid), pid, a, b, float(qtw)))
            pid += 1
    if not pair_rows:
        return _topk(
            scored.withColumn("score", F.col("score") * F.lit(w_t)), qcfg.k
        ).select("qid", "rank", "docid", "score")

    pairs = pd.DataFrame(
        pair_rows, columns=["qid", "pair", "t1", "t2", "qtw"]
    )
    terms = sorted(set(pairs["t1"]) | set(pairs["t2"]))
    # packed per-posting position arrays; no AND over ALL terms here (a
    # pair contributes when just its two members co-occur)
    pos = posting_positions(spark, store, terms, require_all_terms=False)

    e1 = spark.createDataFrame(pairs[["qid", "pair", "t1", "qtw"]])
    e2 = spark.createDataFrame(pairs[["pair", "t2"]])
    p1 = pos.join(
        F.broadcast(e1), pos["term"] == e1["t1"]
    ).select("qid", "pair", "qtw", "docid", "dl",
             F.col("positions").alias("pa"))
    p2 = pos.join(
        F.broadcast(e2), pos["term"] == e2["t2"]
    ).select("pair", "docid", F.col("positions").alias("pb"))

    counter = count_same_order if dependency == "SD" else count_unordered

    @F.pandas_udf(LongType())
    def pair_m(pa: pd.Series, pb: pd.Series, dl: pd.Series) -> pd.Series:
        return pd.Series(
            [
                counter(
                    np.asarray(a, dtype=np.int64),
                    np.asarray(b, dtype=np.int64),
                    window, int(d),
                )
                for a, b, d in zip(pa, pb, dl)
            ],
            dtype="int64",
        )

    matched = p1.join(p2, ["pair", "docid"]).withColumn(
        "m", pair_m("pa", "pb", "dl")
    )
    if variant == "DFR":
        # DFR returns 0 at m == 0 (DFRDependenceScoreModifier.java:91-92)
        # so dropping those rows is pure pruning; MRF must keep them (the
        # length penalty applies whenever both terms are present).
        matched = matched.filter(F.col("m") > 0)
    matched = matched.select("qid", "pair", "docid", "qtw", "dl", "m")

    if variant == "DFR":
        @F.pandas_udf(DoubleType())
        def pair_score(m: pd.Series, dl: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    sd_pair_score(
                        float(mm), float(dd), avgdl, window, ngram_c
                    )
                    for mm, dd in zip(m, dl)
                ]
            )
    else:
        mrf_w_o = w_o  # internal w_o (MRFDependenceScoreModifier:83-84)

        @F.pandas_udf(DoubleType())
        def pair_score(m: pd.Series, dl: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    mrf_pair_score(
                        float(mm), float(dd), num_tokens, num_docs,
                        mrf_mu, mrf_w_o,
                    )
                    for mm, dd in zip(m, dl)
                ]
            )

    prox = (
        matched.withColumn(
            "contrib", F.col("qtw") * F.lit(pair_w) * pair_score("m", "dl")
        )
        .groupBy("qid", "docid")
        .agg(F.sum("contrib").alias("prox"))
    )
    out = (
        scored.join(prox, ["qid", "docid"], "left")
        .withColumn(
            "score",
            F.when(
                F.col("score") > 0,
                F.col("score") * F.lit(w_t) + F.coalesce("prox", F.lit(0.0)),
            ).otherwise(F.col("score") * F.lit(w_t)),
        )
        .select("qid", "docid", "score")
    )
    return _topk(out, qcfg.k).select("qid", "rank", "docid", "score")


def search_with_sd(
    spark: SparkSession,
    store: IndexStore,
    queries: Sequence[Tuple[str, str]],
    qcfg: Optional[QueryConfig] = None,
    window: int = NGRAM_LENGTH,
    w_t: float = 1.0,
    w_o: float = 1.0,
    ngram_c: float = 1.0,
) -> DataFrame:
    """Sequential-dependence retrieval (compatibility wrapper)."""
    return search_with_dependence(
        spark, store, queries, qcfg, dependency="SD", window=window,
        w_t=w_t, w_o=w_o, ngram_c=ngram_c,
    )
