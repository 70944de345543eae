"""Resumable build: checkpoint/lineage correctness, resume-after-failure
equivalence (FIXTURES.md §7), segment compaction, equality with the
monolithic builder."""

import json
import os

import pytest
from pyspark.sql import functions as F

from terrier_spark.config import IndexConfig, QueryConfig
from terrier_spark.index.builder import build_index
from terrier_spark.index.corpus import synth_source_corpus
from terrier_spark.index.resumable import build_index_resumable, compact_postings
from terrier_spark.query.search import search


def table_snapshot(spark, store):
    """Logical content of every index table (parquet bytes depend on task
    scheduling, so equality is asserted on rows, not files)."""
    docs = sorted(
        map(tuple, store.docs(spark).select("docid", "docno", "doclen").collect())
    )
    meta = sorted(
        map(
            tuple,
            store.meta(spark)
            .select("docid", "docno", "repo", "path", "commit", "lang", "sha256")
            .collect(),
        )
    )
    lex = sorted(
        map(tuple, store.lexicon(spark).select("term", "termid", "nt", "tf").collect())
    )
    post = {}
    from terrier_spark.compression.vbyte import decode_scoring_block

    for row in store.postings(spark).collect():
        ids, tfs, dls = decode_scoring_block(row["block"])
        for d, t, l in zip(ids, tfs, dls):
            post[(row["term"], int(d))] = (int(t), int(l))
    return docs, meta, lex, post


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_source_corpus(spark, n_docs=300).repartition(6).cache()


def test_resumable_matches_monolithic(spark, corpus, tmp_path):
    """Same corpus partitioning -> same docids -> identical index content
    from both builders."""
    c = synth_source_corpus(spark, n_docs=300)
    mono = build_index(spark, c, str(tmp_path / "mono"), bucket_span=128)
    seg = build_index_resumable(
        spark, c, str(tmp_path / "seg"), bucket_span=128
    )
    assert seg.stats == mono.stats
    sm, ss = table_snapshot(spark, mono), table_snapshot(spark, seg)
    assert sm == ss


def test_checkpoints_lineage(spark, corpus, tmp_path):
    out = str(tmp_path / "idx")
    store = build_index_resumable(spark, corpus, out, bucket_span=128)
    with open(os.path.join(out, "checkpoints", "partitions.json")) as fh:
        rows = json.load(fh)
    assert all(r["status"] == "built" for r in rows)
    assert sum(int(r["n_docs"]) for r in rows) == 300
    offs = sorted(
        (int(r["docid_offset"]), int(r["n_docs"])) for r in rows
    )
    acc = 0
    for off, n in offs:
        assert off == acc
        acc += n
    assert all(len(r["sha256_agg"]) == 64 for r in rows if int(r["n_docs"]) > 0)


def test_resume_after_partial_build_identical(spark, corpus, tmp_path):
    """Deterministic 'killed after a subset of partitions committed'
    state via skip_partitions, then a resume run; final index content
    must equal an uninterrupted build's."""
    ok = str(tmp_path / "ok")
    partial = str(tmp_path / "partial")
    full = build_index_resumable(spark, corpus, ok, bucket_span=128)

    build_index_resumable(
        spark, corpus, partial, bucket_span=128, skip_partitions={3, 4}
    )
    committed = [
        s for s in os.listdir(os.path.join(partial, "segments"))
        if os.path.exists(os.path.join(partial, "segments", s, "_SUCCESS"))
    ]
    assert len(committed) == 4  # 6 partitions minus the 2 skipped

    resumed = build_index_resumable(spark, corpus, partial, bucket_span=128)
    with open(os.path.join(partial, "checkpoints", "partitions.json")) as fh:
        rows = json.load(fh)
    by_pid = {int(r["partition_id"]): r["status"] for r in rows}
    assert by_pid[3] == "built" and by_pid[4] == "built"
    assert sum(1 for s in by_pid.values() if s == "cached") == 4
    assert table_snapshot(spark, resumed) == table_snapshot(spark, full)
    # lineage survives the resume: cached rows keep their original sha
    assert all(
        len(r["sha256_agg"]) == 64 for r in rows if int(r["n_docs"]) > 0
    )


def test_crash_path_resumes(spark, corpus, tmp_path):
    """Real exception mid-job: whatever committed before the abort is
    reused; the resume run completes and matches a clean build."""
    ok = str(tmp_path / "ok2")
    crashed = str(tmp_path / "crashed")
    full = build_index_resumable(spark, corpus, ok, bucket_span=128)
    with pytest.raises(Exception):
        build_index_resumable(
            spark, corpus, crashed, bucket_span=128, fail_partitions={5}
        )
    resumed = build_index_resumable(spark, corpus, crashed, bucket_span=128)
    assert table_snapshot(spark, resumed) == table_snapshot(spark, full)


def test_compaction_preserves_content_and_search(spark, corpus, tmp_path):
    out = str(tmp_path / "cidx")
    store = build_index_resumable(spark, corpus, out, bucket_span=128)
    before = table_snapshot(spark, store)
    n_blocks_before = store.postings(spark).count()

    compacted = compact_postings(spark, store)
    assert compacted.layout == "segmented_compacted"
    after = table_snapshot(spark, compacted)
    assert before == after
    n_blocks_after = compacted.postings(spark).count()
    assert n_blocks_after <= n_blocks_before

    res = search(spark, compacted, [("q", "sym1 sym2 sym3")],
                 QueryConfig(k=10))
    assert res.count() >= 0
