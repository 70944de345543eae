"""Weighting models as closed-form score kernels.

Contract formula — Terrier's BM25 variant
(org/terrier/matching/models/BM25.java:43-74, defaults k1=1.2, k3=8,
b=0.75; log base 2 via WeightingModelLibrary.java:40-60):

    K     = k1*((1-b) + b*doclen/avgdl) + tf
    score = tf*(k3+1)*qtf / ((k3+qtf)*K) * log2((N - Nt + 0.5)/(Nt + 0.5))

Quirks replicated exactly (rank-critical, SURVEY.md §2.6): no (k1+1)
numerator factor, and tf appears inside K.

Every model is a pure function over
(tf, doclen, Nt, tf_collection, qtf, N, avgdl, num_tokens) — the
reference's WeightingModel.prepare() plumbing (WeightingModel.java:50-106)
— provided in two forms: numpy (inside the Arrow decode UDF) and a
pyspark Column expression (for the pure-DataFrame path / SQL oracles).
"""

from __future__ import annotations

import math
import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from terrier_spark.config import BM25Config


def idf_bm25(N: int, nt, cfg: BM25Config | None = None):
    """log2((N - Nt + 0.5)/(Nt + 0.5)) — numpy or scalar."""
    return np.log2((N - np.asarray(nt, dtype=np.float64) + 0.5)
                   / (np.asarray(nt, dtype=np.float64) + 0.5))


def bm25_np(tf, dl, nt, qtf, N: int, avgdl: float,
            cfg: BM25Config = BM25Config()):
    """Vectorized numpy BM25 (idf folded in)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    qtf = np.asarray(qtf, dtype=np.float64)
    K = cfg.k1 * ((1.0 - cfg.b) + cfg.b * dl / avgdl) + tf
    idf = idf_bm25(N, nt)
    return (tf * (cfg.k3 + 1.0) * qtf / ((cfg.k3 + qtf) * K)) * idf


def bm25_partial_np(tf, dl, qtf, idf, N: int, avgdl: float,
                    cfg: BM25Config = BM25Config()):
    """Same, with idf precomputed per term (the common path: idf is a
    per-(qid,term) constant joined onto posting rows)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    K = cfg.k1 * ((1.0 - cfg.b) + cfg.b * dl / avgdl) + tf
    return (tf * (cfg.k3 + 1.0) * np.asarray(qtf, np.float64)
            / ((cfg.k3 + np.asarray(qtf, np.float64)) * K)) * np.asarray(idf, np.float64)


def bm25_score_scalar(tf: float, dl: float, nt: int, qtf: float, N: int,
                      avgdl: float, cfg: BM25Config = BM25Config()) -> float:
    K = cfg.k1 * ((1.0 - cfg.b) + cfg.b * dl / avgdl) + tf
    idf = math.log2((N - nt + 0.5) / (nt + 0.5))
    return (tf * (cfg.k3 + 1.0) * qtf / ((cfg.k3 + qtf) * K)) * idf


def bm25_col(tf: Column, dl: Column, nt: Column, qtf: Column, N: int,
             avgdl: float, cfg: BM25Config = BM25Config()) -> Column:
    """Pure-Column BM25 for the DataFrame-only scoring path."""
    tfd = tf.cast("double")
    K = F.lit(cfg.k1) * (F.lit(1.0 - cfg.b) + F.lit(cfg.b) * dl.cast("double") / F.lit(avgdl)) + tfd
    idf = F.log2((F.lit(float(N)) - nt.cast("double") + F.lit(0.5)) / (nt.cast("double") + F.lit(0.5)))
    qtfd = qtf.cast("double")
    return (tfd * F.lit(cfg.k3 + 1.0) * qtfd / ((F.lit(cfg.k3) + qtfd) * K)) * idf


# NOTE: the general weighting-model registry (the reference's
# WeightingModelFactory surface) lives in terrier_spark/query/models.py;
# this module keeps only the BM25 contract kernels used by the oracle
# comparisons and the Column-expression form.
