"""Pure-Python retrieval oracle (FIXTURES.md §5, SURVEY.md §5c).

Computes exact BM25 top-k with the reference formula over an in-memory
corpus, sharing ONLY the text pipeline with the engine (tokenize/stop/
stem are pinned by their own goldens) — the index build, compression and
scoring paths are fully independent, so engine-vs-oracle equality is a
real end-to-end check of docid assignment, posting construction, VByte
round-trip, statistics and scoring.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence, Tuple

from terrier_spark.config import BM25Config, PipelineConfig, QueryConfig
from terrier_spark.text.pipeline import make_pipeline


class OracleIndex:
    def __init__(self, contents: Sequence[str], pipeline: PipelineConfig):
        """contents[i] = content of docid i (caller fixes the docid order)."""
        pipe = make_pipeline(pipeline)
        self.doclen: List[int] = []
        self.postings: Dict[str, Dict[int, int]] = {}
        for docid, text in enumerate(contents):
            terms = pipe.terms(text or "")
            self.doclen.append(len(terms))
            for term, tf in Counter(terms).items():
                self.postings.setdefault(term, {})[docid] = tf
        self.num_docs = len(contents)
        self.num_tokens = sum(self.doclen)
        self.avgdl = self.num_tokens / self.num_docs if self.num_docs else 0.0
        self.pipeline = pipeline

    def nt(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def tf_collection(self, term: str) -> int:
        return sum(self.postings.get(term, {}).values())

    def search(self, query: str, qcfg: QueryConfig | None = None
               ) -> List[Tuple[int, float]]:
        """-> [(docid, score)] ranked score desc, docid asc, length <= k."""
        qcfg = qcfg or QueryConfig()
        bm25 = qcfg.bm25
        pipe = make_pipeline(self.pipeline)
        qcounts = Counter(pipe.query_terms(query))
        acc: Dict[int, float] = {}
        for term, qtf in qcounts.items():
            plist = self.postings.get(term)
            if not plist:
                continue
            if qcfg.ignore_low_idf and self.tf_collection(term) > self.num_docs:
                continue
            nt = len(plist)
            idf = math.log2((self.num_docs - nt + 0.5) / (nt + 0.5))
            for docid, tf in plist.items():
                K = bm25.k1 * ((1 - bm25.b) + bm25.b * self.doclen[docid] / self.avgdl) + tf
                s = (tf * (bm25.k3 + 1.0) * qtf / ((bm25.k3 + qtf) * K)) * idf
                acc[docid] = acc.get(docid, 0.0) + s
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[: qcfg.k]
