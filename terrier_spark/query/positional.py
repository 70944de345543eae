"""Index-backed phrase and proximity matching over positional postings.

The reference's PhraseIterablePosting (structures/postings/
PhraseIterablePosting.java:44) walks aligned posting iterators checking
consecutive positions; ProximityIterablePosting (:45) checks a window.

Plan shape (scale-reworked in round 2): intersect BEFORE decoding
positions —

  1. bucket-level AND on block METADATA only (a matching doc needs every
     term, and bucket labels partition docids identically across terms),
     pruning whole blocks without reading their bytes;
  2. decode surviving blocks to ONE ROW PER POSTING carrying its
     position list as an array column (never one row per position — a
     hot term's billions of positions would otherwise be shuffled before
     any intersection);
  3. docid-level AND on those posting rows, then evaluate the phrase /
     window predicate with JVM array expressions (array_intersect /
     exists) on the few docs containing all terms.

Positions index the KEPT pipeline term stream (BlockIndexer semantics).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrier_spark.compression.vbyte import decode_positions, decode_scoring_block
from terrier_spark.index.store import IndexStore


def posting_positions(spark: SparkSession, store: IndexStore,
                      terms: Sequence[str],
                      require_all_terms: bool = True) -> DataFrame:
    """-> (term, docid, dl, positions array<long>) — one row per POSTING
    of the given terms, positions packed as an array.  With
    require_all_terms (the AND-semantics fast path), blocks are first
    pruned to buckets containing every term (metadata only), and posting
    rows to docids containing every term."""
    if not store.manifest.get("positions"):
        raise ValueError(
            "index was built without positions (IndexConfig.positions=True "
            "required for phrase/proximity)"
        )
    tset = sorted(set(terms))
    n = len(tset)
    blocks = store.postings(spark).filter(F.col("term").isin(tset))
    if require_all_terms and n > 1:
        ok_buckets = (
            blocks.groupBy("bucket")
            .agg(F.count_distinct("term").alias("__nt"))
            .filter(F.col("__nt") == n)
            .select("bucket")
        )
        blocks = blocks.join(ok_buckets, "bucket", "left_semi")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for row in pdf.itertuples():
                ids, tfs, dls = decode_scoring_block(row.block)
                if ids.size == 0 or row.pos is None:
                    continue
                outs.append(pd.DataFrame({
                    "term": row.term,
                    "docid": ids,
                    "dl": dls,
                    "positions": decode_positions(row.pos, tfs),
                }))
            if outs:
                yield pd.concat(outs)

    rows = blocks.select("term", "block", "pos").mapInPandas(
        decode,
        schema="term string, docid long, dl long, positions array<long>",
    )
    if require_all_terms and n > 1:
        cand = (
            rows.groupBy("docid")
            .agg(F.count_distinct("term").alias("__nt"))
            .filter(F.col("__nt") == n)
            .select("docid")
        )
        rows = rows.join(cand, "docid", "left_semi")
    return rows


def position_rows(spark: SparkSession, store: IndexStore,
                  terms: Sequence[str],
                  require_all_terms: bool = False) -> DataFrame:
    """-> (term, docid, pos) exploded rows (compatibility surface; the
    phrase/proximity paths below stay on packed arrays)."""
    rows = posting_positions(spark, store, terms, require_all_terms)
    return rows.select(
        "term", "docid", F.explode("positions").alias("pos")
    )


def phrase_docs(spark: SparkSession, store: IndexStore,
                phrase_terms: Sequence[str]) -> DataFrame:
    """Docids containing the exact phrase (consecutive kept-stream
    positions) -> (docid).

    Candidate phrase-start positions survive term by term:
    S_0 = positions(t_0);  S_i = S_{i-1} ∩ (positions(t_i) − i) — a pure
    array_intersect on the packed arrays, JVM-side, per candidate doc."""
    rows = posting_positions(spark, store, phrase_terms)
    cur = rows.filter(F.col("term") == phrase_terms[0]).select(
        "docid", F.col("positions").alias("starts")
    )
    for i, term in enumerate(phrase_terms[1:], start=1):
        nxt = rows.filter(F.col("term") == term).select(
            "docid", F.col("positions").alias("p")
        )
        cur = (
            cur.join(nxt, "docid")
            .select(
                "docid",
                F.array_intersect(
                    "starts",
                    F.transform("p", lambda x: x - F.lit(i)),
                ).alias("starts"),
            )
            .filter(F.size("starts") > 0)
        )
    return cur.select("docid").distinct()


def proximity_docs(spark: SparkSession, store: IndexStore,
                   terms: Sequence[str], window: int) -> DataFrame:
    """Docids where all terms co-occur within a `window` of kept-stream
    positions of an anchor occurrence of the first term (unordered)
    -> (docid)."""
    rows = posting_positions(spark, store, terms)
    cur = rows.filter(F.col("term") == terms[0]).select(
        "docid", F.col("positions").alias("anchors")
    )
    for term in terms[1:]:
        nxt = rows.filter(F.col("term") == term).select(
            "docid", F.col("positions").alias("p")
        )
        cur = (
            cur.join(nxt, "docid")
            .select(
                "docid",
                F.filter(
                    "anchors",
                    lambda a: F.exists(
                        F.col("p"),
                        lambda x: F.abs(x - a) <= F.lit(window),
                    ),
                ).alias("anchors"),
            )
            .filter(F.size("anchors") > 0)
        )
    return cur.select("docid").distinct()
