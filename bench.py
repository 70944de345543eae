"""Headline benchmark (driver-run per round; BASELINE.md protocol).

Phases (reference protocol, BASELINE.md):
  index_build      full index build over the documents corpus (docs/sec)
  bm25_batch_cold  900-query BM25 top-k batch (9 length buckets x 100,
                   SingleLineTRECQuery-style), first repetition
  bm25_batch_warm  same batch repeated; the measured one (the fork runs
                   4x and keeps the last — TrecTerrier.java:47-50; we run
                   2x and keep the warm one to stay inside round budget)

Output: ONE JSON line
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {phase: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time


def make_query_set(vocab: list[str], n_per_bucket: int = 100, seed: int = 42):
    rng = random.Random(seed)
    queries = []
    qid = 0
    for length in range(2, 11):
        for _ in range(n_per_bucket):
            terms = [vocab[rng.randrange(len(vocab))] for _ in range(length)]
            queries.append((str(qid), " ".join(terms)))
            qid += 1
    return queries


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    k = int(os.environ.get("BENCH_K", "1000"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from terrier_spark.config import IndexConfig, QueryConfig
    from terrier_spark.index.corpus import load_documents_corpus
    from terrier_spark.index.resumable import build_index_resumable
    from terrier_spark.query.search import search
    from terrier_spark.session import get_spark

    spark = get_spark("terrier-spark-bench", cpus=cpus,
                      shuffle_partitions=cpus)
    out_dir = tempfile.mkdtemp(prefix="terrier_bench_")
    phases: dict[str, float] = {}
    try:
        # the testdata parquet is a single file -> a single input
        # partition; spread it so the build parallelizes
        corpus = load_documents_corpus(spark, sf_dir).repartition(cpus * 2)

        # the segmented builder + compaction is the scale architecture
        # (map-side blocks + per-partition checkpoints, then the
        # geometric-merge pass) — benchmark what production would run
        from terrier_spark.index.resumable import compact_postings

        t0 = time.time()
        store = build_index_resumable(spark, corpus, out_dir, IndexConfig(),
                                      bucket_span=1024)
        phases["index_build"] = round(time.time() - t0, 3)
        t0 = time.time()
        store = compact_postings(spark, store)
        phases["compact"] = round(time.time() - t0, 3)
        n_docs = store.stats["num_docs"]

        vocab = [
            r["term"]
            for r in store.lexicon(spark)
            .orderBy(F.desc("nt"))
            .limit(2000)
            .collect()
        ]
        queries = make_query_set(vocab)
        # the testdata documents corpus is low-idf-saturated (tiny vocab);
        # disable the drop so the benchmark actually scores postings
        qcfg = QueryConfig(k=k, ignore_low_idf=False, prune=True)

        for phase in ("bm25_batch_cold", "bm25_batch_warm"):
            t0 = time.time()
            res = search(spark, store, queries, qcfg)
            n_rows = res.count()  # materialize the whole batch
            phases[phase] = round(time.time() - t0, 3)

        # per-query latency sample (the reference's "Time to process
        # query" protocol): individual warm queries, p50/p95
        sample = queries[:: max(len(queries) // 24, 1)][:24]
        lat = []
        for qid, text in sample:
            t0 = time.time()
            search(spark, store, [(qid, text)], qcfg).count()
            lat.append(time.time() - t0)
        lat.sort()
        phases["per_query_p50"] = round(lat[len(lat) // 2], 3)
        phases["per_query_p95"] = round(lat[int(len(lat) * 0.95)], 3)

        total = sum(phases.values())
        build_tput = round(n_docs / phases["index_build"], 2)
        qps_warm = round(len(queries) / phases["bm25_batch_warm"], 2)
        print(
            json.dumps(
                {
                    "metric": "index-build + 2x900-query BM25 top-k batch "
                              "wall seconds (docs/sec and warm q/s in "
                              "extras)",
                    "value": round(total, 3),
                    "unit": "sec",
                    "queries": phases,
                    "sf": sf_dir,
                    "extras": {
                        "num_docs": n_docs,
                        "build_docs_per_sec": build_tput,
                        "warm_queries_per_sec": qps_warm,
                        "result_rows": n_rows,
                        "cpus": cpus,
                        "k": k,
                    },
                }
            )
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
