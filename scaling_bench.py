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
# sized so per-doc compute (~200us/doc across tokenize+shuffle+encode)
# dominates Spark's ~5-8s of fixed per-job overhead at the 8-core level;
# otherwise the efficiency ratio measures scheduler constants, not the
# pipeline
REPLICAS = int(os.environ.get("SCALING_REPLICAS", "960"))
WARM_REPLICAS = int(os.environ.get("SCALING_WARM_REPLICAS", "8"))
LEVELS = [int(x) for x in os.environ.get("SCALING_LEVELS", "8,32").split(",")]
# local[N] bounds concurrent TASKS, not CPUs: each task pairs a JVM
# thread with a Python worker process, so an unpinned local[8] run can
# consume ~16 cores and fake the baseline.  taskset pins the whole
# process tree (JVM + Python workers) to exactly N cores, which is what
# "N executors vs 4N executors" means.
PIN_CPUS = os.environ.get("SCALING_PIN", "1") == "1"


def worker(cpus: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    from pyspark.sql import functions as F

    from terrier_spark.config import IndexConfig, QueryConfig
    from terrier_spark.index.builder import build_index
    from terrier_spark.index.corpus import load_documents_corpus
    from terrier_spark.query.search import search
    from terrier_spark.session import get_spark

    from bench import make_query_set

    spark = get_spark(f"scaling-{cpus}", cpus=cpus, shuffle_partitions=cpus)

    def replicated(n_rep: int):
        base = load_documents_corpus(spark, SF_DIR)
        return (
            base.crossJoin(spark.range(n_rep).withColumnRenamed("id", "rep"))
            .withColumn("docno", F.concat_ws("_", "docno", "rep"))
            .withColumn("path", F.concat_ws("_", "path", "rep"))
            .drop("rep")
            .repartition(cpus * 4)
        )

    out = tempfile.mkdtemp(prefix=f"scaling_{cpus}_")
    try:
        # small warm-up build (JVM JIT, python workers, parquet writers),
        # then the measured build — the fork's repeat-and-keep-last
        # discipline (TrecTerrier.java:47-50)
        build_index(spark, replicated(WARM_REPLICAS), f"{out}/warm",
                    IndexConfig(), bucket_span=4096)
        corpus = replicated(REPLICAS)
        t0 = time.time()
        store = build_index(spark, corpus, f"{out}/meas", IndexConfig(),
                            bucket_span=4096)
        build_sec = time.time() - t0
        n_docs = store.stats["num_docs"]

        query_sec, n_queries = None, 0
        if os.environ.get("SCALING_QUERIES", "0") == "1":
            vocab = [r["term"] for r in store.lexicon(spark).limit(2000).collect()]
            queries = make_query_set(sorted(vocab), n_per_bucket=25)
            qcfg = QueryConfig(k=1000, ignore_low_idf=False, prune=True)
            search(spark, store, queries, qcfg).count()  # cold
            t0 = time.time()
            search(spark, store, queries, qcfg).count()
            query_sec = round(time.time() - t0, 3)
            n_queries = len(queries)
        print(
            "WORKER_RESULT "
            + json.dumps(
                {
                    "cpus": cpus,
                    "n_docs": n_docs,
                    "build_sec": round(build_sec, 3),
                    "build_docs_per_sec": round(n_docs / build_sec, 2),
                    "warm_query_sec": query_sec,
                    "queries": n_queries,
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
    report = {
        "levels": results,
        "parallelism_ratio": ratio,
        "build_throughput_speedup": round(build_speedup, 3),
        "build_scaling_efficiency": round(build_speedup / ratio, 3),
        "cpu_pinned": PIN_CPUS,
        "sf_dir": SF_DIR,
        "replicas": REPLICAS,
    }
    if results[lo].get("warm_query_sec") and results[hi].get("warm_query_sec"):
        qsp = results[lo]["warm_query_sec"] / results[hi]["warm_query_sec"]
        report["warm_query_speedup"] = round(qsp, 3)
        report["query_scaling_efficiency"] = round(qsp / ratio, 3)
    print(json.dumps(report, indent=2))
    with open("BENCH_SCALING.json", "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
