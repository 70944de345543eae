"""Two-parallelism scaling benchmark (BASELINE.json north rule: N vs 4N
executors at >=0.8 index-build throughput scaling efficiency; the
sandbox stand-in is local[8] vs local[32] in separate JVMs on the same
input).

Usage:
    python scaling_bench.py                  # run both levels, report
    python scaling_bench.py --worker --cpus 8   # one level (internal)

The corpus is the sf0.1 documents table replicated REPLICAS x with
distinct docnos (deterministic; ~40k docs) so per-doc compute dominates
fixed session/job overhead.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SCALING_REPLICAS", "64"))
LEVELS = [int(x) for x in os.environ.get("SCALING_LEVELS", "8,32").split(",")]
# local[N] bounds concurrent TASKS, not CPUs: each task pairs a JVM
# thread with a Python worker process, so an unpinned local[8] run can
# consume ~16 cores and fake the baseline.  taskset pins the whole
# process tree (JVM + Python workers) to exactly N cores, which is what
# "N executors vs 4N executors" means.
PIN_CPUS = os.environ.get("SCALING_PIN", "1") == "1"


def worker(cpus: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from terrier_spark.config import IndexConfig, QueryConfig
    from terrier_spark.index.builder import build_index
    from terrier_spark.index.corpus import load_documents_corpus
    from terrier_spark.query.search import search
    from terrier_spark.session import get_spark

    from bench import make_query_set

    spark = get_spark(f"scaling-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    corpus = load_documents_corpus(spark, SF_DIR)
    corpus = (
        corpus.crossJoin(spark.range(REPLICAS).withColumnRenamed("id", "rep"))
        .withColumn("docno", F.concat_ws("_", "docno", "rep"))
        .withColumn("path", F.concat_ws("_", "path", "rep"))
        .drop("rep")
        .repartition(cpus * 2)
    )
    corpus = corpus.persist()
    corpus.count()  # warm the input scan out of the measurement
    out = tempfile.mkdtemp(prefix=f"scaling_{cpus}_")
    try:
        # warm-up build (JVM JIT + python worker startup), then the
        # measured build — the fork's repeat-and-keep-last discipline
        # (TrecTerrier.java:47-50)
        build_index(spark, corpus, f"{out}/warm", IndexConfig(),
                    bucket_span=4096)
        t0 = time.time()
        store = build_index(spark, corpus, f"{out}/meas", IndexConfig(),
                            bucket_span=4096)
        build_sec = time.time() - t0
        n_docs = store.stats["num_docs"]

        vocab = [r["term"] for r in store.lexicon(spark).limit(2000).collect()]
        queries = make_query_set(sorted(vocab), n_per_bucket=25)
        qcfg = QueryConfig(k=1000, ignore_low_idf=False, prune=True)
        search(spark, store, queries, qcfg).count()  # cold
        t0 = time.time()
        search(spark, store, queries, qcfg).count()
        query_sec = time.time() - t0
        print(
            "WORKER_RESULT "
            + json.dumps(
                {
                    "cpus": cpus,
                    "n_docs": n_docs,
                    "build_sec": round(build_sec, 3),
                    "build_docs_per_sec": round(n_docs / build_sec, 2),
                    "warm_query_sec": round(query_sec, 3),
                    "queries": len(queries),
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    if args.worker:
        worker(args.cpus)
        return

    results = {}
    for cpus in LEVELS:
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--cpus", str(cpus)]
        if PIN_CPUS:
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1800,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("WORKER_RESULT "):
                results[cpus] = json.loads(line[len("WORKER_RESULT "):])
        if cpus not in results:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            raise SystemExit(f"worker {cpus} produced no result")

    lo, hi = min(LEVELS), max(LEVELS)
    ratio = hi / lo
    build_speedup = (
        results[hi]["build_docs_per_sec"] / results[lo]["build_docs_per_sec"]
    )
    query_speedup = (
        results[lo]["warm_query_sec"] / results[hi]["warm_query_sec"]
    )
    report = {
        "levels": results,
        "parallelism_ratio": ratio,
        "build_throughput_speedup": round(build_speedup, 3),
        "build_scaling_efficiency": round(build_speedup / ratio, 3),
        "warm_query_speedup": round(query_speedup, 3),
        "query_scaling_efficiency": round(query_speedup / ratio, 3),
        "sf_dir": SF_DIR,
        "replicas": REPLICAS,
    }
    print(json.dumps(report, indent=2))
    with open("BENCH_SCALING.json", "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
