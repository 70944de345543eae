"""Distributed inverted-index build.

Spark-first re-expression of the reference's single-pass / MapReduce
indexing (org/terrier/structures/indexing/singlepass/
BasicSinglePassIndexer.java:173-306, hadoop/Hadoop_BasicSinglePassIndexer.java:82-107):

  map side   = tokenize + per-(term,docid) partial counts (Spark's partial
               hash aggregation plays the role of MemoryPostings "runs");
  shuffle    = sort-based exchange keyed (term, bucket) — the analog of
               SplitEmittedTerm's (term, splitno) composite key with
               secondary sort (SplitEmittedTerm.java:53-147,239-293);
  reduce     = applyInPandas per (term, bucket): sort docids, chunk into
               1024-posting VByte blocks (IntegerCodingPostingOutputStream.java:194-267).

Skew: grouping by (term, docid-range bucket) instead of bare term bounds
every reduce group at `bucket_span` postings, so a billion-posting hot
term ("for"/"int" in code corpora) becomes many bounded groups rather
than one straggler task — the two-phase (term, salt) pre-aggregation the
north rule demands, with the salt chosen so it is ALSO the block-max
pruning axis (buckets align across terms).
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import asdict
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from terrier_spark.compression.vbyte import encode_scoring_block
from terrier_spark.config import IndexConfig, PipelineConfig
from terrier_spark.index.docids import assign_docids
from terrier_spark.index.store import IndexStore
from terrier_spark.text.pipeline import make_pipeline

DEFAULT_BUCKET_SPAN = 1 << 16

BLOCK_SCHEMA = (
    "term string, bucket long, block_id int, n int, first_docid long, "
    "last_docid long, max_tf int, min_dl int, block binary"
)


def terms_udf(cfg: PipelineConfig):
    """Arrow-vectorized pandas UDF: content -> array<string> of pipeline
    terms.  The regex/stem work is C-level per document; no per-row Python
    in the Spark sense (one UDF invocation per Arrow batch)."""

    def run(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pipe = make_pipeline(cfg)
        for series in batch_iter:
            yield series.map(lambda t: pipe.terms(t) if t else [])

    from pyspark.sql.functions import pandas_udf

    return pandas_udf(run, ArrayType(StringType()))


def _encode_group(cfg_block_size: int):
    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("docid")
        ids = pdf["docid"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["doclen"].to_numpy(np.int64)
        term = pdf["term"].iloc[0]
        bucket = int(pdf["bucket"].iloc[0])
        rows = []
        for b0 in range(0, ids.size, cfg_block_size):
            b1 = min(b0 + cfg_block_size, ids.size)
            blk_ids, blk_tfs, blk_dls = ids[b0:b1], tfs[b0:b1], dls[b0:b1]
            rows.append(
                (
                    term,
                    bucket,
                    b0 // cfg_block_size,
                    b1 - b0,
                    int(blk_ids[0]),
                    int(blk_ids[-1]),
                    int(blk_tfs.max()),
                    int(blk_dls.min()),
                    encode_scoring_block(blk_ids, blk_tfs, blk_dls),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "term", "bucket", "block_id", "n", "first_docid",
                "last_docid", "max_tf", "min_dl", "block",
            ],
        )

    return encode


def tokenized_corpus(corpus: DataFrame, cfg: IndexConfig) -> DataFrame:
    """corpus (docno, repo, path, commit, lang, content) ->
    (docid, docno, repo, path, commit, lang, sha256, doclen, terms)."""
    with_ids = assign_docids(corpus, order_by=cfg.sort_docids_by)
    udf = terms_udf(cfg.pipeline)
    return (
        with_ids
        # per-row invariant: content sha256 survives from ingest through
        # docid assignment into the meta table (computed JVM-side)
        .withColumn("sha256", F.sha2(F.col("content"), 256))
        .withColumn("terms", udf(F.col("content")))
        .withColumn("doclen", F.size("terms").cast("long"))
        .drop("content")
    )


def posting_rows(doc_terms: DataFrame) -> DataFrame:
    """(docid, doclen, terms) -> one row per (term, docid) with tf.
    doclen rides along (functionally dependent on docid) so block encoding
    never needs a docs-table join."""
    return (
        doc_terms.select("docid", "doclen", F.explode("terms").alias("term"))
        .groupBy("term", "docid", "doclen")
        .agg(F.count("*").cast("int").alias("tf"))
    )


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    cfg: Optional[IndexConfig] = None,
    bucket_span: int = DEFAULT_BUCKET_SPAN,
) -> IndexStore:
    """Build the full index (docs/meta/lexicon/postings/stats) under
    out_dir.  Returns an IndexStore handle."""
    cfg = cfg or IndexConfig()
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)

    doc_terms = tokenized_corpus(corpus, cfg)
    doc_terms.persist()

    # --- docs + meta ------------------------------------------------------
    docs = doc_terms.select("docid", "docno", "doclen")
    docs.write.mode("overwrite").parquet(f"{out_dir}/docs")
    meta = doc_terms.select(
        "docid", "docno", "repo", "path", "commit", "lang", "sha256"
    )
    meta.write.mode("overwrite").parquet(f"{out_dir}/meta")

    # --- postings ---------------------------------------------------------
    postings = posting_rows(doc_terms).withColumn(
        "bucket", (F.col("docid") / F.lit(bucket_span)).cast("long")
    )
    blocks = postings.groupBy("term", "bucket").applyInPandas(
        _encode_group(cfg.block_size), schema=BLOCK_SCHEMA
    )
    # sort by term so parquet row-group min/max stats prune term lookups
    (
        blocks.repartitionByRange(cfg.shuffle_partitions, "term", "bucket")
        .sortWithinPartitions("term", "bucket", "block_id")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/postings")
    )

    # --- lexicon ----------------------------------------------------------
    # One aggregation replaces the reference's temp-lexicon merge machinery
    # (LexiconBuilder.java:78,343-424).  termid = dense rank in
    # lexicographic term order (RunsMerger.java:236).
    blocks_df = spark.read.parquet(f"{out_dir}/postings")
    lex_agg = blocks_df.groupBy("term").agg(
        F.sum("n").cast("long").alias("nt"),
        F.max("max_tf").alias("max_tf"),
        F.min("min_dl").alias("min_dl"),
    )
    # collection frequency needs per-posting tf sums: aggregate from the
    # posting rows (cheap second agg over the same shuffle output)
    tf_agg = postings.groupBy("term").agg(F.sum("tf").cast("long").alias("tf"))
    lexicon = lex_agg.join(tf_agg, "term")
    lexicon = assign_docids(lexicon, order_by=["term"], id_col="__rank")
    lexicon = lexicon.withColumn("termid", F.col("__rank").cast("long")).drop("__rank")
    (
        lexicon.repartitionByRange(max(cfg.shuffle_partitions // 4, 1), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/lexicon")
    )

    # --- stats ------------------------------------------------------------
    lex_read = spark.read.parquet(f"{out_dir}/lexicon")
    docs_read = spark.read.parquet(f"{out_dir}/docs")
    drow = docs_read.agg(
        F.count("*").alias("num_docs"), F.sum("doclen").alias("num_tokens")
    ).collect()[0]
    lrow = lex_read.agg(
        F.count("*").alias("num_terms"), F.sum("nt").alias("num_pointers")
    ).collect()[0]
    num_docs = drow["num_docs"] or 0
    num_tokens = int(drow["num_tokens"] or 0)
    stats = {
        "num_docs": int(num_docs),
        "num_terms": int(lrow["num_terms"] or 0),
        "num_tokens": num_tokens,
        "num_pointers": int(lrow["num_pointers"] or 0),
        "avg_doclen": (num_tokens / num_docs) if num_docs else 0.0,
    }

    n_docs = int(num_docs)
    doc_terms.unpersist()
    elapsed = time.time() - t0
    manifest = {
        "version": 1,
        "bucket_span": bucket_span,
        "block_size": cfg.block_size,
        "pipeline": asdict(cfg.pipeline) | {
            "stopwords": sorted(cfg.pipeline.stopwords or ())
        },
        "stats": stats,
        "metrics": {
            "build_seconds": round(elapsed, 3),
            "docs_per_sec": round(n_docs / elapsed, 2) if elapsed > 0 else None,
            "num_docs": n_docs,
        },
    }
    with open(f"{out_dir}/manifest.json", "w") as fh:
        json.dump(manifest, fh, indent=2)
    return IndexStore(out_dir)
