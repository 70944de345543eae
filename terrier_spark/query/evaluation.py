"""TREC-style run output + ad-hoc retrieval evaluation.

Run format `qid Q0 docno rank score tag` mirrors
org/terrier/structures/outputformat/TRECDocnoOutputFormat.java:79-110;
evaluation computes the measures of
org/terrier/evaluation/AdhocEvaluation.java:50-124,227-272 (MAP,
precision@rank, R-precision) from a results DataFrame and a qrels
table — the reference's `TrecTerrier -e` as a library call.
"""

from __future__ import annotations

from typing import Dict, Iterable, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRECISION_RANKS = (1, 2, 3, 4, 5, 10, 15, 20, 30, 50, 100, 200, 500, 1000)


def to_trec_run(results: DataFrame, tag: str = "terrier_spark") -> DataFrame:
    """(qid, rank, docno|docid, score, ...) -> one formatted line per row
    in rank order: `qid Q0 docno rank score tag`."""
    docno = F.col("docno") if "docno" in results.columns else F.col("docid")
    return results.select(
        F.concat_ws(
            " ",
            F.col("qid"), F.lit("Q0"), docno.cast("string"),
            F.col("rank").cast("string"), F.col("score").cast("string"),
            F.lit(tag),
        ).alias("line"),
        "qid", "rank",
    ).orderBy("qid", "rank").select("line")


def to_trec_docid_run(results: DataFrame,
                      tag: str = "terrier_spark") -> DataFrame:
    """TRECDocidOutputFormat (structures/outputformat/
    TRECDocidOutputFormat.java:64-101): run lines keyed by the internal
    docid instead of the docno."""
    return results.select(
        F.concat_ws(
            " ",
            F.col("qid"), F.lit("Q0"), F.col("docid").cast("string"),
            F.col("rank").cast("string"), F.col("score").cast("string"),
            F.lit(tag),
        ).alias("line"),
        "qid", "rank",
    ).orderBy("qid", "rank").select("line")


def to_raw_output(results: DataFrame) -> DataFrame:
    """RawOutputFormat analog (structures/outputformat/
    RawOutputFormat.java): the bare (qid, docid, score) triples with no
    TREC decoration, ordered by rank."""
    return results.select("qid", "docid", "score", "rank").orderBy(
        "qid", "rank"
    ).select("qid", "docid", "score")


def to_null_output(results: DataFrame) -> DataFrame:
    """NullOutputFormat (structures/outputformat/NullOutputFormat.java):
    discards the results (an empty frame with the line schema) — used to
    benchmark retrieval without I/O."""
    return results.sparkSession.createDataFrame([], "line string")


def parse_qrels(lines: Iterable[str]) -> Dict[str, set]:
    """TREC qrels `qid 0 docno rel` -> {qid: {docno relevant}}
    (org/terrier/evaluation/TRECQrelsInMemory.java)."""
    rel: Dict[str, set] = {}
    for line in lines:
        parts = line.split()
        if len(parts) < 4:
            continue
        qid, _, docno, grade = parts[:4]
        if int(grade) > 0:
            rel.setdefault(qid, set()).add(docno)
    return rel


def evaluate_named_page(
    results: pd.DataFrame,
    qrels: Mapping[str, set],
    doc_col: str = "docno",
    cutoff: int = 50,
) -> Dict[str, object]:
    """Named/home-page finding evaluation
    (org/terrier/evaluation/NamedPageEvaluation.java:75-170): the
    measure is the average reciprocal rank of the FIRST relevant
    document per query, counted only when it appears within the top
    `cutoff` (50) results; plus the fraction of queries answered within
    ranks 1/5/10/20/50 and the fraction not answered in the top 50.
    Queries without judgements are skipped, as the reference does."""
    recip: Dict[str, float] = {}
    first_rank: Dict[str, int] = {}
    n_q = 0
    for qid, grp in results.groupby("qid"):
        relevant = qrels.get(str(qid))
        if not relevant:
            continue
        n_q += 1
        rank_of_first = 0  # 0 = not found (reference sentinel)
        for i, d in enumerate(grp.sort_values("rank")[doc_col]):
            if str(d) in relevant:
                rank_of_first = i + 1  # reference ranks are 1-based here
                break
        first_rank[str(qid)] = rank_of_first
        if 0 < rank_of_first <= cutoff:
            recip[str(qid)] = 1.0 / rank_of_first
    if n_q == 0:
        return {"ARR": 0.0, "recip_rank_per_query": {}, "num_queries": 0,
                "in_top": {}, "not_in_top50": 0.0}
    in_top = {
        k: sum(1 for r in first_rank.values() if 0 < r <= k) / n_q
        for k in (1, 5, 10, 20, cutoff)
    }
    not_found = sum(
        1 for r in first_rank.values() if r == 0 or r > cutoff
    ) / n_q
    return {
        "ARR": sum(recip.values()) / n_q,
        "recip_rank_per_query": recip,
        "first_rank_per_query": first_rank,
        "num_queries": n_q,
        "in_top": in_top,
        "not_in_top50": not_found,
    }


def normalize_trec_qid(qid: str) -> str:
    """Strip non-numeric characters from a query id, as the reference's
    full-query evaluation does before qrels lookup
    (org/terrier/evaluation/AdhocFullQueryEvaluation.java:108-114)."""
    return "".join(c for c in str(qid) if c.isdigit())


def evaluate_full_query(
    results: pd.DataFrame,
    qrels: Mapping[str, set],
    doc_col: str = "docno",
) -> Dict[str, object]:
    """Query-by-query evaluation of a run — "like trec_eval -q"
    (org/terrier/evaluation/AdhocFullQueryEvaluation.java:40-76): query
    ids are numeric-normalised before the qrels lookup, queries without
    judgements are skipped, and every AdhocEvaluation measure is
    reported PER QUERY alongside the usual averages.

    -> {"per_query": {qid: {AP, R_precision, P_at, num_relevant,
    num_retrieved, num_relevant_retrieved}}, "aggregate": <the
    evaluate_run() dict over the same normalised run>}."""
    norm = results.copy()
    norm["qid"] = [normalize_trec_qid(q) for q in norm["qid"]]
    qrels_norm: Dict[str, set] = {}
    for qid, docs in qrels.items():
        qrels_norm.setdefault(normalize_trec_qid(qid), set()).update(docs)
    per_query: Dict[str, dict] = {}
    for qid, grp in norm.groupby("qid"):
        relevant = qrels_norm.get(str(qid))
        if not relevant:
            continue  # unjudged: skipped (:116-117)
        one = evaluate_run(grp, {str(qid): relevant}, doc_col=doc_col)
        docs = [str(d) for d in grp.sort_values("rank")[doc_col]]
        per_query[str(qid)] = {
            "AP": one["MAP"],
            "R_precision": one["R_precision"],
            "P_at": one["P_at"],
            "num_relevant": len(relevant),
            "num_retrieved": len(docs),
            "num_relevant_retrieved": sum(
                1 for d in docs if d in relevant
            ),
        }
    return {
        "per_query": per_query,
        "aggregate": evaluate_run(norm, qrels_norm, doc_col=doc_col),
    }


def evaluate_run(
    results: pd.DataFrame,
    qrels: Mapping[str, set],
    doc_col: str = "docno",
) -> Dict[str, object]:
    """results: pandas (qid, rank, docno/docid) sorted by rank per qid.
    -> {MAP, R-precision, P@k dict, per-query AP} over queries WITH
    judgements (AdhocEvaluation skips unjudged queries, :117-124)."""
    ap_per_query: Dict[str, float] = {}
    rprec_per_query: Dict[str, float] = {}
    prec_at: Dict[int, float] = {k: 0.0 for k in PRECISION_RANKS}
    n_q = 0
    for qid, grp in results.groupby("qid"):
        relevant = qrels.get(str(qid))
        if not relevant:
            continue
        n_q += 1
        R = len(relevant)
        grp = grp.sort_values("rank")
        docs = [str(d) for d in grp[doc_col]]
        hits = 0
        ap = 0.0
        for i, d in enumerate(docs):
            if d in relevant:
                hits += 1
                ap += hits / (i + 1)
            if (i + 1) in prec_at:
                prec_at[i + 1] += hits / (i + 1)
        n_ret = len(docs)
        final_hits = hits
        for k in PRECISION_RANKS:
            if k > n_ret:
                prec_at[k] += final_hits / k
        ap_per_query[str(qid)] = ap / R
        r_hits = sum(1 for d in docs[:R] if d in relevant)
        rprec_per_query[str(qid)] = r_hits / R if R else 0.0
    if n_q == 0:
        return {"MAP": 0.0, "R_precision": 0.0, "P_at": {},
                "AP_per_query": {}, "num_queries": 0}
    return {
        "MAP": sum(ap_per_query.values()) / n_q,
        "R_precision": sum(rprec_per_query.values()) / n_q,
        "P_at": {k: v / n_q for k, v in prec_at.items()},
        "AP_per_query": ap_per_query,
        "num_queries": n_q,
    }
