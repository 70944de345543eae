"""Result post-filters — the reference's PostFilter chain
(querying/Manager.java runPostFilters stage):

  decorate  attach metadata columns to results
            (org/terrier/querying/SimpleDecorate.java)
  scope     keep results whose docno starts with a prefix
            (org/terrier/querying/Scope.java — TREC collection scoping)
  site      keep results from a repo/host
            (org/terrier/querying/SiteFilter.java — url host match; here
            the corpus analog is the repo column)

All are DataFrame transforms applied AFTER ranking; ranks are
recomputed post-filter so the contract (dense 0-based rank per qid)
holds, as the reference's filter chain re-numbers output ranks.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terrier_spark.index.store import IndexStore


def _rerank(res: DataFrame) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    return res.withColumn("rank", F.row_number().over(w) - F.lit(1))


def decorate(spark: SparkSession, store: IndexStore, res: DataFrame,
             columns: Sequence[str] = ("docno", "repo", "path", "lang",
                                       "sha256")) -> DataFrame:
    meta = store.meta(spark).select("docid", *columns)
    return res.join(meta, "docid")


def scope_filter(spark: SparkSession, store: IndexStore, res: DataFrame,
                 docno_prefix: str) -> DataFrame:
    if "docno" not in res.columns:
        res = decorate(spark, store, res, columns=("docno",))
    return _rerank(res.filter(F.col("docno").startswith(docno_prefix)))


def site_filter(spark: SparkSession, store: IndexStore, res: DataFrame,
                repo: str) -> DataFrame:
    if "repo" not in res.columns:
        res = decorate(spark, store, res, columns=("docno", "repo"))
    return _rerank(res.filter(F.col("repo") == repo))
