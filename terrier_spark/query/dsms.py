"""Generic post-matching document-score-modifier (DSM) chain.

The reference applies an arbitrary list of DocumentScoreModifiers to the
result set after matching (querying/Manager.java:746-857).  Re-expressed
here: each DSM is a transform over the scored frame
(qid, docid, score, occ) where `occ` is the matched-query-term bitmask
(bit i = query term i matched the doc — the ResultSet `occurrences`
array the reference carries).  The bitmask is a long (64 terms) rather
than the reference's short (16).

Implemented DSMs (matching/dsms/*.java):
  * ResetScores           — set every score to a constant
                            (ResetScores.java, reset.scores.default)
  * BooleanScoreModifier  — drop docs lacking ALL terms of a subset
                            (or all query terms) (BooleanScoreModifier.java)
  * BooleanFallback       — drop docs missing any non-negative query
                            term, but ONLY if at least one doc matches
                            them all; otherwise leave the ranking
                            untouched (BooleanFallback.java)
  * SimpleStaticScoreModifier — add w * static_prior(docid) to the top
                            `modified_length` ranked docs with non-zero
                            scores (SimpleStaticScoreModifier.java;
                            mean1 / maxmin normalisation supported)

Dropped docs are scored -inf and stripped before the final top-k, as
Manager.runMatching does (:836-848).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terrier_spark.config import QueryConfig
from terrier_spark.index.store import IndexStore
from terrier_spark.query.parser import parse_query
from terrier_spark.query.search import _topk, search_terms
from terrier_spark.text.pipeline import make_pipeline

NEG_INF = float("-inf")


@dataclass
class DsmContext:
    """Per-batch query facts the DSMs need: pipeline term order (= bit
    positions), negative terms, per-qid full masks."""

    term_index: pd.DataFrame      # (qid, term, idx)
    negatives: dict               # qid -> set of pipeline terms
    spark: SparkSession = None
    store: IndexStore = None

    def full_mask(self) -> pd.DataFrame:
        """(qid, mask) with a bit per query term."""
        g = self.term_index.groupby("qid")["idx"].apply(
            lambda s: sum(1 << int(i) for i in s)
        )
        return g.reset_index(name="mask")

    def mask_of(self, qid: str, terms) -> int:
        sel = self.term_index[
            (self.term_index["qid"] == qid)
            & (self.term_index["term"].isin(list(terms)))
        ]
        return sum(1 << int(i) for i in sel["idx"])


class ResetScores:
    """ResetScores.java: every score := default (reset.scores.default)."""

    def __init__(self, default: float = 0.00001):
        self.default = default

    def apply(self, df: DataFrame, ctx: DsmContext) -> DataFrame:
        return df.withColumn("score", F.lit(self.default))


class BooleanScoreModifier:
    """BooleanScoreModifier.java: docs whose occurrence mask lacks any of
    the selected terms (default: all query terms) are scored -inf."""

    def __init__(self, terms: Optional[Sequence[str]] = None):
        self.terms = list(terms) if terms is not None else None

    def apply(self, df: DataFrame, ctx: DsmContext) -> DataFrame:
        masks = ctx.full_mask()
        if self.terms is not None:
            pipe_terms = self.terms
            masks = masks.assign(
                mask=[
                    ctx.mask_of(q, pipe_terms) for q in masks["qid"]
                ]
            )
        mdf = ctx.spark.createDataFrame(masks, "qid string, mask long")
        return (
            df.join(F.broadcast(mdf), "qid", "left")
            .withColumn(
                "score",
                F.when(
                    F.col("occ").bitwiseAND(F.col("mask")) == F.col("mask"),
                    F.col("score"),
                ).otherwise(F.lit(NEG_INF)),
            )
            .drop("mask")
        )


class BooleanFallback:
    """BooleanFallback.java: mask = query terms NOT marked negative; if
    any doc has score > 0 and matches the full mask, drop (score -inf)
    every scoring doc that does not; else leave scores untouched."""

    def apply(self, df: DataFrame, ctx: DsmContext) -> DataFrame:
        rows = []
        for qid, grp in ctx.term_index.groupby("qid"):
            neg = ctx.negatives.get(qid, set())
            mask = sum(
                1 << int(i)
                for t, i in zip(grp["term"], grp["idx"]) if t not in neg
            )
            rows.append((qid, mask, int(grp["idx"].size)))
        mdf = ctx.spark.createDataFrame(
            pd.DataFrame(rows, columns=["qid", "mask", "n_terms"]),
            "qid string, mask long, n_terms int",
        )
        joined = df.join(F.broadcast(mdf), "qid", "left")
        matches = F.col("occ").bitwiseAND(F.col("mask")) == F.col("mask")
        w = Window.partitionBy("qid")
        return (
            joined.withColumn(
                "__any_full",
                F.max(
                    F.when((F.col("score") > 0) & matches, 1).otherwise(0)
                ).over(w),
            )
            .withColumn(
                "score",
                F.when(
                    # <2 query terms: modifier is a no-op (:75-76)
                    (F.col("n_terms") < 2)
                    | (F.col("__any_full") == 0)
                    | ~((F.col("score") > 0) & ~matches),
                    F.col("score"),
                ).otherwise(F.lit(NEG_INF)),
            )
            .drop("mask", "n_terms", "__any_full")
        )


class SimpleStaticScoreModifier:
    """SimpleStaticScoreModifier.java: score(d) += w * prior(d) for the
    top `modified_length` ranked docs with non-zero score.  `priors` is a
    DataFrame (docid, prior); normalise in {None, 'mean1', 'maxmin'}."""

    def __init__(self, priors: DataFrame, w: float = 1.0,
                 modified_length: int = 1000,
                 normalise: Optional[str] = None):
        self.priors = priors
        self.w = w
        self.modified_length = modified_length
        self.normalise = normalise

    def apply(self, df: DataFrame, ctx: DsmContext) -> DataFrame:
        pr = self.priors.select("docid", F.col("prior").cast("double"))
        if self.normalise == "mean1":
            mean = pr.agg(F.avg("prior")).collect()[0][0] or 1.0
            pr = pr.withColumn("prior", F.col("prior") / F.lit(mean))
        elif self.normalise == "maxmin":
            row = pr.agg(F.max("prior"), F.min("prior")).collect()[0]
            hi, lo = row[0] or 1.0, row[1] or 0.0
            span = (hi - lo) or 1.0
            pr = pr.withColumn(
                "prior", (F.col("prior") - F.lit(lo)) / F.lit(span)
            )
        w_rank = Window.partitionBy("qid").orderBy(
            F.col("score").desc(), F.col("docid").asc()
        )
        ranked = df.withColumn("__r", F.row_number().over(w_rank))
        out = (
            ranked.join(F.broadcast(pr), "docid", "left")
            .withColumn(
                "score",
                F.when(
                    (F.col("__r") <= F.lit(self.modified_length))
                    & (F.col("score") != 0.0)
                    & F.col("prior").isNotNull(),
                    F.col("score") + F.lit(self.w) * F.col("prior"),
                ).otherwise(F.col("score")),
            )
            .drop("__r", "prior")
        )
        return out


def search_with_dsms(
    spark: SparkSession,
    store: IndexStore,
    queries: Sequence[Tuple[str, str]],
    dsms: Sequence,
    qcfg: Optional[QueryConfig] = None,
) -> DataFrame:
    """Score the (structured-syntax) queries, compute the per-doc matched
    term bitmask, run the DSM list in order, strip -inf docs, top-k
    -> (qid, rank, docid, score)."""
    from terrier_spark.query.structured import _docids_with_terms

    qcfg = qcfg or QueryConfig()
    pipe = make_pipeline(store.pipeline_config())
    fields = tuple(store.stats.get("fields") or ())

    qterm_rows, idx_rows, negatives = [], [], {}
    for qid, text in queries:
        parsed = parse_query(text, fields or None)
        # the DSM chain scores flat term bags; silently dropping a
        # parsed phrase / field restriction / OR-group would change the
        # query's meaning without warning — refuse and point at the path
        # that honours them (search_structured applies them before the
        # same matching core)
        unsupported = [
            name
            for name, got in (
                ("phrases", parsed.phrases),
                ("field restrictions", parsed.field_terms),
                ("disjunctive groups", parsed.disjunctions),
            )
            if got
        ]
        if unsupported:
            raise ValueError(
                f"query {qid!r} uses {', '.join(unsupported)}, which "
                "search_with_dsms does not apply — run it through "
                "search_structured, or drop the construct explicitly"
            )
        seen: list[str] = []
        weights: dict[str, float] = {}
        for raw, wt in parsed.terms:
            for t in pipe.terms(raw):
                if t not in weights:
                    seen.append(t)
                weights[t] = weights.get(t, 0.0) + wt
        negatives[str(qid)] = {
            t for raw in parsed.negative for t in pipe.terms(raw)
        }
        # negative terms occupy bit positions too (they are query terms
        # in MatchingQueryTerms order) but do not score
        for raw in parsed.negative:
            for t in pipe.terms(raw):
                if t not in weights and t not in seen:
                    seen.append(t)
        for i, t in enumerate(seen):
            idx_rows.append((str(qid), t, i))
        for t, wt in weights.items():
            qterm_rows.append((str(qid), t, wt))

    qterms = pd.DataFrame(qterm_rows, columns=["qid", "term", "qtf"])
    term_index = pd.DataFrame(idx_rows, columns=["qid", "term", "idx"])
    ctx = DsmContext(term_index=term_index, negatives=negatives,
                     spark=spark, store=store)

    from dataclasses import replace

    scored = search_terms(
        spark, store, qterms, replace(qcfg, k=1 << 31)
    ).select("qid", "docid", "score")

    # negative terms knock their docs out during matching (the reference
    # scores them -inf and strips, Manager.java:800-848) — DSMs run on
    # the surviving set
    neg_rows = [
        (qid, t) for qid, ts in negatives.items() for t in ts
    ]
    if neg_rows:
        bad = _docids_with_terms(
            spark, store,
            pd.DataFrame(neg_rows, columns=["qid", "term"]),
        ).select("qid", "docid")
        scored = scored.join(bad, ["qid", "docid"], "left_anti")

    # occurrence bitmask over ALL query terms (scoring + negative)
    hits = _docids_with_terms(
        spark, store, term_index[["qid", "term"]].drop_duplicates()
    )
    occ = (
        hits.join(
            F.broadcast(
                spark.createDataFrame(
                    term_index, "qid string, term string, idx int"
                )
            ),
            ["qid", "term"],
        )
        .groupBy("qid", "docid")
        .agg(F.expr("bit_or(shiftleft(1L, idx))").alias("occ"))
    )
    df = scored.join(occ, ["qid", "docid"], "left").fillna({"occ": 0})

    for dsm in dsms:
        df = dsm.apply(df, ctx)

    df = df.filter(F.col("score") != NEG_INF).select("qid", "docid", "score")
    return _topk(df, qcfg.k).select("qid", "rank", "docid", "score")
