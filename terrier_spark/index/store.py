"""IndexStore — handle over a persisted index directory.

Layout (all parquet + a JSON manifest; Iceberg-shaped: each table is an
independent dataset and the manifest plays the catalog role the
reference's .properties file plays, org/terrier/structures/
CollectionStatistics.java:40-43):

    out_dir/
      docs/        docid, docno, doclen
      meta/        docid, docno, repo, path, commit, lang, sha256
      lexicon/     term, termid, nt, tf, max_tf, min_dl
      postings/    term, bucket, block_id, n, first_docid, last_docid,
                   max_tf, min_dl, block(binary)
      manifest.json
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class IndexStore:
    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "manifest.json")) as fh:
            self.manifest = json.load(fh)
        # driver-side lexicon cache: repeated searches against the same
        # store skip the lexicon-scan job (the reference keeps its lexicon
        # memory-mapped for the same reason); only populated when small
        self._lexicon_pdf = None
        self._postings_partitions = None
        self._postings_df = None
        self._postings_key = None

    def postings_scan_partitions(self, spark: SparkSession) -> int:
        """Number of scan partitions the postings dataset yields (cached;
        a plain file-scan plan, so this is metadata-cheap)."""
        if self._postings_partitions is None:
            self._postings_partitions = self.postings(
                spark
            ).rdd.getNumPartitions()
        return self._postings_partitions

    @property
    def stats(self) -> dict:
        return self.manifest["stats"]

    @property
    def bucket_span(self) -> int:
        return self.manifest["bucket_span"]

    @property
    def block_size(self) -> int:
        return self.manifest.get("block_size", 1024)

    def maxscore_index(self, model: str):
        """1-based position of `model` in the stored per-block max_score
        arrays (for element_at), or None when the metadata is absent,
        does not cover the model, or is STALE — the stats snapshot taken
        at compaction time no longer matches the live collection stats
        (segments appended since), in which case the unit-score maxima
        are no longer valid bounds and must not prune."""
        models = self.manifest.get("maxscore_models") or []
        if model not in models:
            return None
        snap = self.manifest.get("maxscore_stats") or {}
        if (
            snap.get("num_docs") != self.stats.get("num_docs")
            or snap.get("num_tokens") != self.stats.get("num_tokens")
        ):
            return None
        return models.index(model) + 1

    @property
    def layout(self) -> str:
        # "monolithic" (builder.build_index) or "segmented"/
        # "segmented_compacted" (resumable.build_index_resumable): segment
        # tables are read as one multi-path parquet dataset — no copy step
        return self.manifest.get("layout", "monolithic")

    def docs(self, spark: SparkSession) -> DataFrame:
        if self.layout.startswith("segmented"):
            return spark.read.parquet(f"{self.path}/segments/seg_*/docs.parquet")
        if os.path.isdir(f"{self.path}/docs"):  # layout version 1
            return spark.read.parquet(f"{self.path}/docs")
        # v2 monolithic layout: docs is a projection of meta (one write)
        return spark.read.parquet(f"{self.path}/meta").select(
            "docid", "docno", "doclen"
        )

    def meta(self, spark: SparkSession) -> DataFrame:
        if self.layout.startswith("segmented"):
            return spark.read.parquet(f"{self.path}/segments/seg_*/meta.parquet")
        return spark.read.parquet(f"{self.path}/meta")

    def lexicon(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(f"{self.path}/lexicon")

    LEXICON_CACHE_MAX_TERMS = 200_000

    def lexicon_lookup(self, spark: SparkSession, terms):
        """Lexicon rows for `terms` as a pandas frame.  Small lexicons are
        fetched once and served driver-side afterwards (no Spark job);
        large ones fall back to a term-pruned parquet scan."""
        import pandas as pd
        from pyspark.sql import functions as F

        cols = ["term", "nt", "tf", "max_tf", "min_dl"]
        if self.stats.get("fields"):
            # field indexes carry per-term per-field collection stats
            # (FieldEntryStatistics analog) when built by this version
            lex_cols = set(self.lexicon(spark).columns)
            cols += [c for c in ("field_tf", "max_ftf_f", "min_fln_f")
                     if c in lex_cols]
        if self._lexicon_pdf is None and (
            self.stats.get("num_terms", 1 << 60) <= self.LEXICON_CACHE_MAX_TERMS
        ):
            self._lexicon_pdf = (
                self.lexicon(spark).select(*cols).toPandas()
                .set_index("term", drop=False)
            )
        if self._lexicon_pdf is not None:
            hit = self._lexicon_pdf[self._lexicon_pdf.index.isin(terms)]
            return hit.reset_index(drop=True)
        return (
            self.lexicon(spark)
            .filter(F.col("term").isin(list(terms)))
            .select(*cols)
            .toPandas()
        )

    def postings(self, spark: SparkSession) -> DataFrame:
        # Memoized per (session, visible segment set): building the reader
        # costs ~90ms of py4j/file-listing round trips per call, which
        # dominates interactive single-query latency.  The key re-lists
        # the segment directory (cheap, driver-local) so an incremental
        # index that appended segments since the last call gets a fresh
        # plan instead of a stale one.  Keyed on applicationId, not
        # id(spark): a stopped session's object id can be recycled by a
        # new SparkSession, which would hand out a DataFrame bound to a
        # dead JVM session.
        key = (spark.sparkContext.applicationId,
               self._segment_fingerprint())
        if self._postings_df is not None and self._postings_key == key:
            return self._postings_df
        df = self._postings_uncached(spark)
        self._postings_df, self._postings_key = df, key
        return df

    def _segment_fingerprint(self) -> tuple:
        try:  # catches in-place rebuilds/compactions on a reused object
            mtime = os.stat(os.path.join(self.path, "manifest.json")).st_mtime_ns
        except OSError:
            mtime = 0
        seg_root = os.path.join(self.path, "segments")
        if not os.path.isdir(seg_root):
            return (mtime,)
        return (mtime, *sorted(os.listdir(seg_root)))

    def _postings_uncached(self, spark: SparkSession) -> DataFrame:
        if self.layout == "segmented_compacted":
            df = spark.read.parquet(f"{self.path}/postings_compact")
            # segments appended AFTER the recorded compaction are not in
            # the compact file yet — union them so queries between
            # compactions see a consistent index
            recorded = self.manifest.get("compacted_segments")
            if recorded is None:
                # legacy manifest without coverage info: the compact file
                # was written over all segments existing at the time
                return df
            covered = set(recorded)
            seg_root = os.path.join(self.path, "segments")
            extra = (
                [
                    os.path.join(seg_root, d, "postings.parquet")
                    for d in sorted(os.listdir(seg_root))
                    if d not in covered
                    and os.path.exists(os.path.join(seg_root, d, "_SUCCESS"))
                ]
                if os.path.isdir(seg_root) else []
            )
            if extra:
                df = df.unionByName(spark.read.parquet(*extra))
            return df
        if self.layout == "segmented":
            return spark.read.parquet(
                f"{self.path}/segments/seg_*/postings.parquet"
            )
        return spark.read.parquet(f"{self.path}/postings")

    def pipeline_config(self):
        from terrier_spark.config import PipelineConfig

        p = dict(self.manifest["pipeline"])
        p["stopwords"] = tuple(p.get("stopwords") or ())
        if p.get("stages") is not None:
            p["stages"] = tuple(p["stages"])
        return PipelineConfig(**p)
