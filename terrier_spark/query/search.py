"""Batch BM25 top-k retrieval over the compressed posting store.

The reference's DAAT heap walk (org/terrier/matching/daat/Full.java:78-186)
becomes a declarative plan Catalyst owns:

    scan postings (term-pruned parquet scan)
      -> broadcast-join per-(qid,term) stats          [lexicon lookup,
         PostingListManager.java:213; low-idf drop :217-219]
      -> [prune] drop (qid,bucket) whose WAND upper bound < theta
         [WAND.java:190-289, made bound-safe at block granularity]
      -> mapInPandas VByte decode + numpy BM25         [vectorized scoring]
      -> groupBy(qid, docid).sum(score)                [accumulators]
      -> per-qid top-k, ties: score desc, docid asc    [pinned — reference
         ties are unstable, daat/CandidateResult.java:52-62]

All queries of a batch run as ONE Spark job (the fork's 900-query
benchmark loop becomes a single plan over a qid dimension).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terrier_spark.compression.vbyte import decode_scoring_block
from terrier_spark.config import BM25Config, QueryConfig
from terrier_spark.index.store import IndexStore
from terrier_spark.query.bm25 import bm25_partial_np, bm25_score_scalar
from terrier_spark.text.pipeline import make_pipeline


def process_queries(queries: Sequence[Tuple[str, str]],
                    pipeline_cfg) -> pd.DataFrame:
    """(qid, text) pairs -> rows (qid, term, qtf): the same term pipeline
    as indexing applied to queries (Manager.java:675-679)."""
    pipe = make_pipeline(pipeline_cfg)
    rows = []
    for qid, text in queries:
        counts: dict[str, int] = {}
        for t in pipe.query_terms(text):
            counts[t] = counts.get(t, 0) + 1
        for term, qtf in counts.items():
            rows.append((str(qid), term, qtf))
    return pd.DataFrame(rows, columns=["qid", "term", "qtf"])


def _qterm_stats(spark: SparkSession, store: IndexStore, qterms: pd.DataFrame,
                 qcfg: QueryConfig) -> pd.DataFrame:
    """Join query terms against the lexicon driver-side (the lexicon rows
    touched == distinct query terms, always tiny), apply the low-idf drop,
    and precompute idf + per-term score upper bounds."""
    stats = store.stats
    N, avgdl = stats["num_docs"], stats["avg_doclen"]
    terms = sorted(set(qterms["term"]))
    if not terms:
        return qterms.iloc[0:0].assign(nt=0, tf=0, idf=0.0, term_ub=0.0)
    lex = (
        store.lexicon(spark)
        .filter(F.col("term").isin(terms))
        .select("term", "nt", "tf", "max_tf", "min_dl")
        .toPandas()
    )
    merged = qterms.merge(lex, on="term", how="inner")  # OOV terms drop out
    if qcfg.ignore_low_idf:
        # drop when collection frequency exceeds N
        # (PostingListManager.java:217-219: N < t.getFrequency())
        merged = merged[merged["tf"] <= N]
    if merged.empty:
        return merged.assign(idf=0.0, term_ub=0.0)
    merged = merged.copy()
    merged["idf"] = np.log2(
        (N - merged["nt"].to_numpy(np.float64) + 0.5)
        / (merged["nt"].to_numpy(np.float64) + 0.5)
    )
    # per-term upper bound from index-time (max_tf, min_dl) — the analog of
    # the fork's query-time exact max-score pre-scan (WAND.java:76-96),
    # computed at index time instead (SURVEY.md §4)
    # per-term upper bound: (max_tf, min_dl) maximizes the tf-part, valid
    # only for idf >= 0; negative-idf terms contribute at most 0
    merged["term_ub"] = [
        max(bm25_score_scalar(r.max_tf, r.min_dl, r.nt, r.qtf, N, avgdl,
                              qcfg.bm25), 0.0)
        if r.idf < 0
        else bm25_score_scalar(r.max_tf, r.min_dl, r.nt, r.qtf, N, avgdl,
                               qcfg.bm25)
        for r in merged.itertuples()
    ]
    return merged


def _decode_score_udf(N: int, avgdl: float, bm25: BM25Config):
    """mapInPandas kernel: (qid, qtf, idf, block) rows -> (qid, docid,
    score) posting rows; VByte decode + BM25 all numpy-vectorized."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_qid, out_docid, out_score = [], [], []
            for row in pdf.itertuples():
                ids, tfs, dls = decode_scoring_block(row.block)
                if ids.size == 0:
                    continue
                scores = bm25_partial_np(
                    tfs, dls, row.qtf, row.idf, N, avgdl, bm25
                )
                out_qid.append(np.full(ids.size, row.qid, dtype=object))
                out_docid.append(ids)
                out_score.append(scores)
            if out_qid:
                yield pd.DataFrame(
                    {
                        "qid": np.concatenate(out_qid),
                        "docid": np.concatenate(out_docid),
                        "score": np.concatenate(out_score),
                    }
                )

    return run


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w) - F.lit(1))
        .filter(F.col("rank") < k)
    )


def search(
    spark: SparkSession,
    store: IndexStore,
    queries: Sequence[Tuple[str, str]],
    qcfg: Optional[QueryConfig] = None,
    with_meta: bool = False,
) -> DataFrame:
    """Batch retrieval -> DataFrame (qid, rank, docid, score[, docno]).

    Rank semantics: score desc, docid asc, 0-based rank, k results
    (BaseMatching.java:283-316 with the tie-break pinned)."""
    qcfg = qcfg or QueryConfig()
    stats = store.stats
    N, avgdl = stats["num_docs"], stats["avg_doclen"]

    qstats = _qterm_stats(
        spark, store, process_queries(queries, store.pipeline_config()), qcfg
    )
    if qstats.empty:
        schema = (
            "qid string, rank int, docid long, docno string, sha256 string, "
            "score double"
            if with_meta
            else "qid string, rank int, docid long, score double"
        )
        return spark.createDataFrame([], schema)

    terms = sorted(set(qstats["term"]))
    blocks = store.postings(spark).filter(F.col("term").isin(terms))
    qs_df = spark.createDataFrame(
        qstats[["qid", "term", "qtf", "idf", "term_ub"]]
    )
    joined = blocks.join(F.broadcast(qs_df), "term")

    if qcfg.prune:
        joined = _prune_buckets(spark, joined, qstats, qcfg, N, avgdl)

    decoded = joined.select("qid", "qtf", "idf", "block").mapInPandas(
        _decode_score_udf(N, avgdl, qcfg.bm25),
        schema="qid string, docid long, score double",
    )
    scored = decoded.groupBy("qid", "docid").agg(F.sum("score").alias("score"))
    out = _topk(scored, qcfg.k).select("qid", "rank", "docid", "score")
    if with_meta:
        meta = store.meta(spark).select("docid", "docno", "sha256")
        out = out.join(meta, "docid").select(
            "qid", "rank", "docid", "docno", "sha256", "score"
        )
    return out


def _prune_buckets(spark, joined: DataFrame, qstats: pd.DataFrame,
                   qcfg: QueryConfig, N: int, avgdl: float) -> DataFrame:
    """Block-max WAND-style bucket pruning, bound-safe two-pass:

    pass 1  exact-score the single most-promising bucket per query (by
            upper bound) -> a valid lower bound theta on the kth-best
            score;
    pass 2  keep only buckets whose upper bound >= theta.

    A pruned bucket's every doc satisfies score <= UB < theta <= kth best,
    so the final top-k is identical to the exhaustive plan (verified by
    tests/test_search.py::test_pruned_equals_unpruned)."""
    bm25 = qcfg.bm25
    # per-(qid,bucket) upper bound: sum over query terms of the best block
    # bound in that bucket.  The (max_tf, min_dl) bound maximizes the
    # tf-part, which is only an UPPER bound when idf >= 0; for negative
    # idf (nt > N/2, kept when ignore_low_idf is off) the safe bound is 0.
    raw_ub = (
        F.col("max_tf").cast("double") * F.lit(bm25.k3 + 1.0) * F.col("qtf")
        / (
            (F.lit(bm25.k3) + F.col("qtf"))
            * (
                F.lit(bm25.k1)
                * (
                    F.lit(1.0 - bm25.b)
                    + F.lit(bm25.b) * F.col("min_dl") / F.lit(avgdl)
                )
                + F.col("max_tf").cast("double")
            )
        )
    ) * F.col("idf")
    block_ub = joined.withColumn(
        "block_ub",
        F.when(F.col("idf") >= 0, raw_ub).otherwise(F.lit(0.0)),
    )
    bucket_ub = (
        block_ub.groupBy("qid", "bucket", "term")
        .agg(F.max("block_ub").alias("t_ub"))
        .groupBy("qid", "bucket")
        .agg(F.sum("t_ub").alias("bucket_ub"))
    )
    bucket_ub.persist()

    # pass 1: best bucket per qid
    w = Window.partitionBy("qid").orderBy(F.col("bucket_ub").desc(), F.col("bucket"))
    best = bucket_ub.withColumn("r", F.row_number().over(w)).filter("r = 1").select(
        "qid", "bucket"
    )
    pass1 = joined.join(F.broadcast(best), ["qid", "bucket"])
    decoded1 = pass1.select("qid", "qtf", "idf", "block").mapInPandas(
        _decode_score_udf(N, avgdl, bm25),
        schema="qid string, docid long, score double",
    )
    kth = (
        decoded1.groupBy("qid", "docid")
        .agg(F.sum("score").alias("score"))
        .groupBy("qid")
        .agg(
            F.sort_array(F.collect_list("score"), asc=False).alias("scores")
        )
        .select(
            "qid",
            F.when(
                F.size("scores") >= qcfg.k, F.col("scores")[qcfg.k - 1]
            ).otherwise(F.lit(float("-inf"))).alias("theta"),
        )
    )
    survivors = (
        bucket_ub.join(F.broadcast(kth), "qid", "left")
        .filter(
            F.col("theta").isNull() | (F.col("bucket_ub") >= F.col("theta"))
        )
        .select("qid", "bucket")
    )
    return joined.join(F.broadcast(survivors), ["qid", "bucket"])
