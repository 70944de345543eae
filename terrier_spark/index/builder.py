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
    "last_docid long, max_tf int, min_dl int, tf_sum long, block binary, "
    "pos binary, ftf binary, fln binary, "
    # per-field block metadata (field indexes only, else null): per-field
    # tf sums (-> lexicon FieldEntryStatistics, SingleFieldModel.java:131),
    # per-field max tf and min length (-> field-aware block-max bounds)
    "ftf_sum array<long>, max_ftf_f array<long>, min_fln_f array<long>, "
    # exact per-block unit-score maxima per registered model (filled at
    # compaction time by index/maxscore.py; null until then — a null
    # bound never prunes)
    "max_score array<double>"
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


def _encode_group(cfg_block_size: int, with_positions: bool = False,
                  with_fields: bool = False):
    from terrier_spark.compression.vbyte import encode_positions, vbyte_encode

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("docid")
        ids = pdf["docid"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["doclen"].to_numpy(np.int64)
        pos_lists = (
            pdf["positions"].tolist() if with_positions else None
        )
        ftf_lists = pdf["ftf"].tolist() if with_fields else None
        fln_lists = pdf["field_lens"].tolist() if with_fields else None
        term = pdf["term"].iloc[0]
        bucket = int(pdf["bucket"].iloc[0])
        rows = []
        for b0 in range(0, ids.size, cfg_block_size):
            b1 = min(b0 + cfg_block_size, ids.size)
            blk_ids, blk_tfs, blk_dls = ids[b0:b1], tfs[b0:b1], dls[b0:b1]
            pos_bytes = ftf_bytes = fln_bytes = None
            ftf_sum = max_ftf_f = min_fln_f = None
            if pos_lists is not None:
                flat = np.concatenate(
                    [np.asarray(p, dtype=np.int64) for p in pos_lists[b0:b1]]
                )
                pos_bytes = encode_positions(flat)
            if ftf_lists is not None:
                # flattened n x F per-posting field tfs and field lengths
                ftf_mat = np.stack(
                    [np.asarray(v, dtype=np.int64) for v in ftf_lists[b0:b1]]
                )
                fln_mat = np.stack(
                    [np.asarray(v, dtype=np.int64) for v in fln_lists[b0:b1]]
                )
                ftf_bytes = vbyte_encode(
                    ftf_mat.reshape(-1).astype(np.uint64)
                )
                fln_bytes = vbyte_encode(
                    fln_mat.reshape(-1).astype(np.uint64)
                )
                ftf_sum = ftf_mat.sum(axis=0).tolist()
                max_ftf_f = ftf_mat.max(axis=0).tolist()
                min_fln_f = fln_mat.min(axis=0).tolist()
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
                    int(blk_tfs.sum()),
                    encode_scoring_block(blk_ids, blk_tfs, blk_dls),
                    pos_bytes,
                    ftf_bytes,
                    fln_bytes,
                    ftf_sum,
                    max_ftf_f,
                    min_fln_f,
                    None,  # max_score: filled by compaction (maxscore.py)
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "term", "bucket", "block_id", "n", "first_docid",
                "last_docid", "max_tf", "min_dl", "tf_sum", "block", "pos",
                "ftf", "fln", "ftf_sum", "max_ftf_f", "min_fln_f",
                "max_score",
            ],
        )

    return encode


def lexicon_from_blocks(blocks_df: DataFrame, nf: int = 0) -> DataFrame:
    """One aggregation over block METADATA replaces the reference's
    temp-lexicon merge machinery (LexiconBuilder.java:78,343-424): nt from
    block posting counts, collection tf from per-block tf sums.  Field
    indexes additionally get per-term per-field collection frequencies
    (the FieldEntryStatistics surface SingleFieldModel consumes,
    structures/FieldLexiconEntry semantics) and per-field (max_ftf,
    min_fln) bounds for field-aware block-max pruning."""
    aggs = [
        F.sum("n").cast("long").alias("nt"),
        F.sum("tf_sum").cast("long").alias("tf"),
        F.max("max_tf").alias("max_tf"),
        F.min("min_dl").alias("min_dl"),
    ]
    for i in range(nf):
        aggs += [
            F.sum(F.element_at("ftf_sum", i + 1)).cast("long").alias(f"__ftf{i}"),
            F.max(F.element_at("max_ftf_f", i + 1)).cast("long").alias(f"__mx{i}"),
            F.min(F.element_at("min_fln_f", i + 1)).cast("long").alias(f"__mn{i}"),
        ]
    lex = blocks_df.groupBy("term").agg(*aggs)
    if nf:
        lex = (
            lex.withColumn("field_tf", F.array(*[f"__ftf{i}" for i in range(nf)]))
            .withColumn("max_ftf_f", F.array(*[f"__mx{i}" for i in range(nf)]))
            .withColumn("min_fln_f", F.array(*[f"__mn{i}" for i in range(nf)]))
            .drop(*[c for i in range(nf)
                    for c in (f"__ftf{i}", f"__mx{i}", f"__mn{i}")])
        )
    return lex


def partition_counts(df: DataFrame) -> dict[int, int]:
    """Per-partition row counts via a pure-JVM scan (no Arrow crossing) —
    the 'side files' of the Hadoop indexer, computed cheaply."""
    rows = (
        df.select(F.spark_partition_id().alias("__pid"))
        .groupBy("__pid").count().collect()
    )
    return {int(r["__pid"]): int(r["count"]) for r in rows}


def tokenized_corpus(corpus: DataFrame, cfg: IndexConfig) -> DataFrame:
    """corpus (docno, repo, path, commit, lang, content) ->
    (docid, docno, repo, path, commit, lang, sha256, doclen, terms).

    Single fused Arrow pass: docid assignment (per-partition offsets from
    a JVM-only count scan), content sha256, tokenization and doc length
    all happen in ONE mapInPandas crossing — content crosses the
    JVM/Python boundary exactly once and never again."""
    if cfg.sort_docids_by:
        # persist to PIN the range partitioning: repartitionByRange
        # re-samples boundaries per job, so without a materialized frame
        # the counts job and the build job could disagree
        corpus = (
            corpus.repartitionByRange(*cfg.sort_docids_by)
            .sortWithinPartitions(*cfg.sort_docids_by)
            .persist()
        )
    counts = partition_counts(corpus)
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    pipe_cfg = cfg.pipeline

    fields = cfg.field_cols  # ordered (field_name, column) pairs or None
    out_schema = (
        "docid long, docno string, repo string, path string, commit string, "
        "lang string, sha256 string, doclen long, uterms array<string>, "
        "upos array<array<int>>, uftf array<array<int>>, "
        "field_lens array<long>"
    )

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from pyspark import TaskContext

        pipe = make_pipeline(pipe_cfg)
        pid = TaskContext.get().partitionId()
        start_id = next_id = offsets.get(pid, 0)
        expected = counts.get(pid, 0)
        for pdf in batches:
            contents = pdf["content"].fillna("")
            field_series = (
                [pdf[col].fillna("") for _, col in fields] if fields else None
            )
            n = len(pdf)
            doclens = np.empty(n, dtype=np.int64)
            uterms_col, upos_col, uftf_col, flens_col = [], [], [], []
            for i in range(n):
                # per-document map-side aggregation (the reference's
                # DocumentPostingList, structures/indexing/
                # DocumentPostingList.java:62-113): one (term ->
                # positions/field-tfs) entry per unique term, so the
                # shuffle carries one row per (doc, term) pair instead of
                # one per token
                if fields:
                    streams = [pipe.terms(s.iat[i]) for s in field_series]
                    terms = [t for s in streams for t in s]
                    nf = len(streams)
                    ftfmap: dict[str, list[int]] = {}
                    for fi, s in enumerate(streams):
                        for t in s:
                            v = ftfmap.get(t)
                            if v is None:
                                v = ftfmap[t] = [0] * nf
                            v[fi] += 1
                    flens_col.append([len(s) for s in streams])
                else:
                    terms = pipe.terms(contents.iat[i])
                    ftfmap = None
                    flens_col.append(None)
                doclens[i] = len(terms)
                posmap: dict[str, list[int]] = {}
                for pos, t in enumerate(terms):
                    posmap.setdefault(t, []).append(pos)
                uterms_col.append(list(posmap.keys()))
                upos_col.append(list(posmap.values()))
                uftf_col.append(
                    [ftfmap[t] for t in posmap] if fields else None
                )
            out = pd.DataFrame(
                {
                    "docid": np.arange(next_id, next_id + n, dtype=np.int64),
                    "docno": pdf["docno"].to_numpy(),
                    "repo": pdf["repo"].to_numpy(),
                    "path": pdf["path"].to_numpy(),
                    "commit": pdf["commit"].to_numpy(),
                    "lang": pdf["lang"].to_numpy(),
                    "sha256": [
                        hashlib.sha256(c.encode("utf-8")).hexdigest()
                        for c in contents
                    ],
                    "doclen": doclens,
                    "uterms": uterms_col,
                    "upos": upos_col,
                    "uftf": uftf_col,
                    "field_lens": flens_col,
                }
            )
            next_id += n
            yield out[["docid", "docno", "repo", "path", "commit", "lang",
                       "sha256", "doclen", "uterms", "upos", "uftf",
                       "field_lens"]]
        if next_id - start_id != expected:
            raise RuntimeError(
                f"partition {pid}: saw {next_id - start_id} rows, count "
                f"pass saw {expected} — input partitioning is not "
                "deterministic across jobs; persist the corpus first"
            )

    return corpus.mapInPandas(fused, schema=out_schema)


def posting_rows(doc_terms: DataFrame,
                 with_positions: bool = False,
                 with_fields: bool = False) -> DataFrame:
    """(docid, doclen, uterms, upos[, uftf, field_lens]) -> one row per
    (term, docid) with tf (and position / field-tf vectors when
    requested).  No aggregation needed: the fused pass already did the
    per-document combine, so this is a pure JVM explode of pre-aggregated
    pairs.  doclen (and field_lens) ride along (functionally dependent on
    docid) so block encoding never needs a docs-table join."""
    zipped = (
        F.arrays_zip("uterms", "upos", "uftf")
        if with_fields
        else F.arrays_zip("uterms", "upos")
    )
    cols = ["docid", "doclen"] + (["field_lens"] if with_fields else [])
    z = doc_terms.select(*cols, F.explode(zipped).alias("z"))
    out = z.select(
        *cols,
        F.col("z.uterms").alias("term"),
        F.size("z.upos").cast("int").alias("tf"),
        F.col("z.upos").alias("positions"),
        *([F.col("z.uftf").alias("ftf")] if with_fields else []),
    )
    if not with_positions:
        out = out.drop("positions")
    return out


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

    # Pin the input partitioning: docid assignment counts partitions in
    # one job and assigns in another, so the partition layout must be
    # identical across jobs.  File scans are stable, but LocalRelations /
    # shuffled inputs are not (Catalyst may even aggregate a local
    # relation driver-side) — persisting materializes one layout both
    # jobs share.  (At true 100 TB scale you'd skip this and require a
    # file-backed source; the fused pass raises loudly on any mismatch.)
    corpus = corpus.persist()
    doc_terms = tokenized_corpus(corpus, cfg)
    doc_terms.persist()

    with_fields = bool(cfg.field_cols)

    # --- meta (docs is a projection of it — one write, not two) -----------
    meta_cols = ["docid", "docno", "repo", "path", "commit", "lang",
                 "sha256", "doclen"] + (["field_lens"] if with_fields else [])
    meta = doc_terms.select(*meta_cols)
    meta.write.mode("overwrite").parquet(f"{out_dir}/meta")

    # --- postings ---------------------------------------------------------
    postings = posting_rows(
        doc_terms, with_positions=cfg.positions, with_fields=with_fields
    ).withColumn(
        "bucket", (F.col("docid") / F.lit(bucket_span)).cast("long")
    )
    blocks = postings.groupBy("term", "bucket").applyInPandas(
        _encode_group(cfg.block_size, with_positions=cfg.positions,
                      with_fields=with_fields),
        schema=BLOCK_SCHEMA,
    )
    # sort by term so parquet row-group min/max stats prune term lookups
    (
        blocks.repartitionByRange(cfg.shuffle_partitions, "term", "bucket")
        .sortWithinPartitions("term", "bucket", "block_id")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/postings")
    )
    doc_terms.unpersist()
    corpus.unpersist()

    # --- lexicon ----------------------------------------------------------
    # One aggregation over block METADATA replaces the reference's
    # temp-lexicon merge machinery (LexiconBuilder.java:78,343-424): nt
    # from block posting counts, collection tf from per-block tf sums —
    # no re-shuffle of posting rows.  termid = dense rank in
    # lexicographic term order (RunsMerger.java:236).
    blocks_df = spark.read.parquet(f"{out_dir}/postings")
    lexicon = lexicon_from_blocks(
        blocks_df, len(cfg.field_cols) if with_fields else 0
    )
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
    meta_read = spark.read.parquet(f"{out_dir}/meta")
    drow = meta_read.agg(
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
    if with_fields:
        nf = len(cfg.field_cols)
        frow = meta_read.select(
            *[
                F.sum(F.element_at("field_lens", i + 1)).alias(f"f{i}")
                for i in range(nf)
            ]
        ).collect()[0]
        stats["fields"] = [name for name, _ in cfg.field_cols]
        stats["field_tokens"] = [int(frow[f"f{i}"] or 0) for i in range(nf)]
        stats["avg_field_lens"] = [
            (stats["field_tokens"][i] / num_docs) if num_docs else 0.0
            for i in range(nf)
        ]

    n_docs = int(num_docs)
    elapsed = time.time() - t0
    manifest = {
        "version": 2,
        "layout": "monolithic",
        "bucket_span": bucket_span,
        "block_size": cfg.block_size,
        "positions": cfg.positions,
        "fields": [list(fc) for fc in cfg.field_cols] if cfg.field_cols else None,
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
