"""Sequential-dependence (MRF) proximity scoring.

Replicates the reference's DFR dependence score modifier for the SD
(sequential dependence) case (matching/dsms/DependenceScoreModifier.java
DAAT loop :240-340, DFRDependenceScoreModifier.scoreFDSD :91-118,
utility/Distance.noTimesSameOrder :255-283):

  * for each ADJACENT query-term pair (i, i+1) present in a retrieved
    document, matchingNGrams counts positions p1 of term i with
    p1 + window <= doclen whose next term-(i+1) position p2 >= p1
    satisfies p2 - p1 < window (window = proximity.ngram.length = 2);
  * pair score (norm2 on, c = proximity.norm2.c = 1):
      nw    = doclen < window ? 1 : doclen - window + 1
      pfn   = m * log2(1 + c*avgdl/nw)
      bg    = avgdl; p = 1/bg; q = 1 - p
      s     = [ -lgamma(bg+1) + lgamma(pfn+1) + lgamma(bg-pfn+1) ] / ln2
              - pfn*log2(p) - (bg-pfn)*log2(q)
      score = s / (1 + pfn)
  * final doc score = w_t * base + sum over pairs of
    qtw_comb * w_o * score  (qtw fnid 1: mean of the two term weights);
    docs whose base score is <= 0 are left unmodified (:260-262).

FD (full dependence, unordered windows) is not implemented.
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
from pyspark.sql.types import DoubleType

from terrier_spark.config import QueryConfig
from terrier_spark.index.store import IndexStore
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


def _positions_with_dl(spark: SparkSession, store: IndexStore,
                       terms: Sequence[str]) -> DataFrame:
    """(term, docid, pos, dl) decoded from positional blocks."""
    from terrier_spark.compression.vbyte import (
        decode_positions,
        decode_scoring_block,
    )

    if not store.manifest.get("positions"):
        raise ValueError(
            "sequential-dependence scoring needs a positional index "
            "(IndexConfig.positions=True)"
        )
    blocks = store.postings(spark).filter(F.col("term").isin(list(terms)))

    def decode(batches):
        for pdf in batches:
            outs = []
            for row in pdf.itertuples():
                ids, tfs, dls = decode_scoring_block(row.block)
                if ids.size == 0 or row.pos is None:
                    continue
                plists = decode_positions(row.pos, tfs)
                outs.append(pd.DataFrame({
                    "term": row.term,
                    "docid": np.repeat(ids, tfs),
                    "pos": np.concatenate(plists),
                    "dl": np.repeat(dls, tfs),
                }))
            if outs:
                yield pd.concat(outs)

    return blocks.select("term", "block", "pos").mapInPandas(
        decode, schema="term string, docid long, pos long, dl long"
    )


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
    """Retrieval with the SD proximity modifier
    -> (qid, rank, docid, score)."""
    qcfg = qcfg or QueryConfig()
    avgdl = store.stats["avg_doclen"]

    qterms = process_queries(queries, store.pipeline_config())
    scored = search_terms(
        spark, store, qterms, replace(qcfg, k=1 << 31)
    ).select("qid", "docid", "score")

    # adjacent pairs in first-occurrence pipeline order (the reference's
    # MatchingQueryTerms term-addition order)
    pipe = make_pipeline(store.pipeline_config())
    pair_rows = []
    pid = 0
    for qid, text in queries:
        seen: list[str] = []
        counts: dict[str, int] = {}
        for t in pipe.query_terms(text):
            if t not in counts:
                seen.append(t)
            counts[t] = counts.get(t, 0) + 1
        for a, b in zip(seen, seen[1:]):
            if a == b:
                continue  # noTimesSameOrder asserts distinct arrays
            qtw = 0.5 * counts[a] + 0.5 * counts[b]  # fnid 1
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
    pos = _positions_with_dl(spark, store, terms)
    pos.persist()

    e1 = spark.createDataFrame(pairs[["qid", "pair", "t1", "qtw"]])
    e2 = spark.createDataFrame(pairs[["pair", "t2"]])
    p1 = pos.join(
        F.broadcast(e1), pos["term"] == e1["t1"]
    ).select("qid", "pair", "qtw", "docid", F.col("pos").alias("p1"), "dl")
    p2 = pos.join(
        F.broadcast(e2), pos["term"] == e2["t2"]
    ).select("pair", "docid", F.col("pos").alias("p2"))
    # a p1 counts iff p1 + window <= dl and SOME p2 in (p1, p1 + window)
    # (the first p2 >= p1 is in-window iff any is; p2 == p1 cannot happen)
    matched = (
        p1.join(p2, ["pair", "docid"])
        .filter(
            (F.col("p2") > F.col("p1"))
            & (F.col("p2") < F.col("p1") + window)
            & (F.col("p1") + window <= F.col("dl"))
        )
        .groupBy("qid", "pair", "docid", "qtw", "dl")
        .agg(F.count_distinct("p1").alias("m"))
    )

    @F.pandas_udf(DoubleType())
    def pair_score(m: pd.Series, dl: pd.Series) -> pd.Series:
        return pd.Series(
            [
                sd_pair_score(float(mm), float(dd), avgdl, window, ngram_c)
                for mm, dd in zip(m, dl)
            ]
        )

    prox = (
        matched.withColumn(
            "contrib", F.col("qtw") * F.lit(w_o) * pair_score("m", "dl")
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
