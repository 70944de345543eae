"""Index-backed phrase and proximity matching over positional postings.

The reference's PhraseIterablePosting (structures/postings/
PhraseIterablePosting.java:44) walks aligned posting iterators checking
consecutive positions; ProximityIterablePosting (:45) checks a window.
Here: decode the positional blocks of the query terms, explode to
(term, docid, position) rows, and express the adjacency/window predicate
as a self-join Catalyst plans (broadcast when one side is small).
Positions index the KEPT pipeline term stream (BlockIndexer semantics).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrier_spark.compression.vbyte import decode_positions, decode_scoring_block
from terrier_spark.index.store import IndexStore


def position_rows(spark: SparkSession, store: IndexStore,
                  terms: Sequence[str]) -> DataFrame:
    """-> (term, docid, pos) for the given terms, decoded from the
    positional posting blocks."""
    if not store.manifest.get("positions"):
        raise ValueError(
            "index was built without positions (IndexConfig.positions=True "
            "required for phrase/proximity)"
        )
    blocks = store.postings(spark).filter(F.col("term").isin(list(terms)))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for row in pdf.itertuples():
                ids, tfs, _ = decode_scoring_block(row.block)
                if ids.size == 0 or row.pos is None:
                    continue
                plists = decode_positions(row.pos, tfs)
                docids = np.repeat(ids, tfs)
                outs.append(
                    pd.DataFrame(
                        {
                            "term": row.term,
                            "docid": docids,
                            "pos": np.concatenate(plists),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    return blocks.select("term", "block", "pos").mapInPandas(
        decode, schema="term string, docid long, pos long"
    )


def phrase_docs(spark: SparkSession, store: IndexStore,
                phrase_terms: Sequence[str]) -> DataFrame:
    """Docids containing the exact phrase (consecutive kept-stream
    positions) -> (docid)."""
    pos = position_rows(spark, store, phrase_terms)
    pos.persist()
    out = pos.filter(F.col("term") == phrase_terms[0]).select(
        "docid", F.col("pos").alias("p0")
    )
    for i, term in enumerate(phrase_terms[1:], start=1):
        nxt = pos.filter(F.col("term") == term).select(
            "docid", F.col("pos").alias(f"p{i}")
        )
        out = out.join(nxt, "docid").filter(
            F.col(f"p{i}") == F.col("p0") + i
        )
    return out.select("docid").distinct()


def proximity_docs(spark: SparkSession, store: IndexStore,
                   terms: Sequence[str], window: int) -> DataFrame:
    """Docids where all terms co-occur within a `window` of kept-stream
    positions (unordered) -> (docid)."""
    pos = position_rows(spark, store, terms)
    pos.persist()
    out = pos.filter(F.col("term") == terms[0]).select(
        "docid", F.col("pos").alias("p0")
    )
    for i, term in enumerate(terms[1:], start=1):
        nxt = pos.filter(F.col("term") == term).select(
            "docid", F.col("pos").alias(f"p{i}")
        )
        out = out.join(nxt, "docid").filter(
            F.abs(F.col(f"p{i}") - F.col("p0")) <= window
        )
    return out.select("docid").distinct()
