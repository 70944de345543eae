"""End-to-end training-data curation + indexing pipeline demo.

    raw corpus
      -> PII scrub               (datapipe.pii_scrub sentinel masking)
      -> quality filter          (datapipe.quality_scores keep flag)
      -> repetition filter       (Gopher repetition rules keep flag)
      -> exact dedup             (keep canonical per content hash)
      -> near-dup removal        (MinHash+LSH verified pairs; drop the
                                  higher-id member of each pair)
      -> inverted-index build    (resumable segmented builder)
      -> BM25 search smoke

Run:  spark-submit --py-files terrier_spark.zip jobs/curate_and_index.py \\
          [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curated_idx_"
    )
    spark = (
        SparkSession.builder.appName("curate-and-index")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from terrier_spark.config import IndexConfig, QueryConfig
    from terrier_spark.datapipe.dedup import exact_duplicates, minhash_lsh_pairs
    from terrier_spark.datapipe.textstats import quality_scores
    from terrier_spark.index.corpus import from_documents_table
    from terrier_spark.index.resumable import build_index_resumable
    from terrier_spark.query.search import search

    from terrier_spark.datapipe.textstats import pii_scrub, repetition_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 0. PII scrub: replace text with the masked version (counts kept
    # for the report); downstream stages see only scrubbed text
    scrubbed = pii_scrub(docs)
    pii_found = scrubbed.agg(
        F.sum("n_emails").alias("emails"),
        F.sum("n_ips").alias("ips"),
        F.sum("n_phones").alias("phones"),
    ).collect()[0]
    docs = docs.drop("text").join(
        scrubbed.select(F.col("id").alias("doc_id"),
                        F.col("scrubbed").alias("text")),
        "doc_id",
    )

    # 1. quality filter (basic heuristics + Gopher repetition rules)
    keep_ids = quality_scores(docs).filter("keep").select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(keep_ids, "doc_id", "left_semi")
    rep_keep = repetition_scores(docs).filter("keep").select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(rep_keep, "doc_id", "left_semi")
    n1 = docs.count()

    # 2. exact dedup: drop non-canonical members of identical-text groups
    dup_groups = exact_duplicates(docs)
    victims = (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .join(dup_groups, "text_hash")
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id")
    )
    docs = docs.join(victims, "doc_id", "left_anti")
    n2 = docs.count()

    # 3. near-dup removal (jaccard >= 0.8 via MinHash LSH + exact verify)
    pairs = minhash_lsh_pairs(docs, threshold=0.8)
    near_victims = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    docs = docs.join(near_victims, "doc_id", "left_anti")
    n3 = docs.count()

    # 4. index the curated corpus
    corpus = from_documents_table(docs)
    store = build_index_resumable(spark, corpus, out_dir, IndexConfig())

    # 5. search smoke
    res = search(
        spark, store, [("q", "fast merge scan")],
        QueryConfig(k=5, ignore_low_idf=False), with_meta=True,
    )
    top = [(r["docno"], round(r["score"], 4)) for r in res.orderBy("rank").collect()]

    print(json.dumps({
        "input_docs": n0,
        "pii_masked": {"emails": int(pii_found["emails"] or 0),
                       "ips": int(pii_found["ips"] or 0),
                       "phones": int(pii_found["phones"] or 0)},
        "after_quality": n1,
        "after_exact_dedup": n2,
        "after_near_dedup": n3,
        "index_dir": out_dir,
        "index_stats": store.stats,
        "sample_query_top5": top,
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
