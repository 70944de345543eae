"""Weighting-model registry (SURVEY.md §2.6).

Every model is a vectorized numpy kernel over
(tf, dl, qtf, nt, F, N, avgdl, num_tokens):
    tf  term frequency in doc        dl   doc length
    qtf term frequency in query      nt   document frequency
    F   collection term frequency    N    number of documents
    avgdl average doc length         num_tokens collection token count

Formulas are exact ports of the reference score() methods (file:line in
each docstring); all logs base 2 (WeightingModelLibrary.java:40-60).

`prunable` marks models monotone increasing in tf and decreasing in dl,
for which score(max_tf, min_dl) upper-bounds every posting in a block
(clamped at 0, which stays a valid bound when idf goes negative) — the
block-max pruning contract.  DPH/DLH are not monotone in tf, so they run
unpruned.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict

import numpy as np

LOG2E = 1.0 / math.log(2.0)


def _f64(*xs):
    return [np.asarray(x, dtype=np.float64) for x in xs]


def bm25(tf, dl, qtf, nt, F, N, avgdl, num_tokens,
         k1=1.2, k3=8.0, b=0.75):
    """BM25.java:70-74 (no (k1+1) factor; tf inside K)."""
    tf, dl, qtf, nt = _f64(tf, dl, qtf, nt)
    K = k1 * ((1 - b) + b * dl / avgdl) + tf
    idf = np.log2((N - nt + 0.5) / (nt + 0.5))
    return (tf * (k3 + 1.0) * qtf / ((k3 + qtf) * K)) * idf


def tf_idf(tf, dl, qtf, nt, F, N, avgdl, num_tokens, k1=1.2, b=0.75):
    """TF_IDF.java score(): Robertson tf x log2(N/nt + 1)."""
    tf, dl, qtf, nt = _f64(tf, dl, qtf, nt)
    rob = k1 * tf / (tf + k1 * (1 - b + b * dl / avgdl))
    idf = np.log2(N / nt + 1.0)
    return qtf * rob * idf


def dirichlet_lm(tf, dl, qtf, nt, F, N, avgdl, num_tokens, mu=2500.0):
    """DirichletLM.java score() (c=2500; no keyFrequency multiplier —
    reference quirk replicated)."""
    tf, dl, F = _f64(tf, dl, F)
    return (
        np.log2(1.0 + tf / (mu * (F / num_tokens)))
        + np.log2(mu / (dl + mu))
    )


def hiemstra_lm(tf, dl, qtf, nt, F, N, avgdl, num_tokens, lam=0.15):
    """Hiemstra_LM.java score() (lambda=0.15; no keyFrequency —
    reference quirk replicated)."""
    tf, dl, F = _f64(tf, dl, F)
    return np.log2(1.0 + (lam * tf * num_tokens) / ((1 - lam) * F * dl))


def pl2(tf, dl, qtf, nt, F, N, avgdl, num_tokens, c=1.0):
    """PL2.java score()."""
    tf, dl, qtf, F = _f64(tf, dl, qtf, F)
    TF = tf * np.log2(1.0 + (c * avgdl) / dl)
    NORM = 1.0 / (TF + 1.0)
    f = F / N
    return NORM * qtf * (
        TF * np.log2(1.0 / f)
        + f * LOG2E
        + 0.5 * np.log2(2 * math.pi * TF)
        + TF * (np.log2(TF) - LOG2E)
    )


def inl2(tf, dl, qtf, nt, F, N, avgdl, num_tokens, c=1.0):
    """InL2.java score(); idfDFR = log2((N+1)/(nt+0.5)) (Idf.java:87-89)."""
    tf, dl, qtf, nt = _f64(tf, dl, qtf, nt)
    TF = tf * np.log2(1.0 + (c * avgdl) / dl)
    return TF * np.log2((N + 1.0) / (nt + 0.5)) * qtf * (1.0 / (TF + 1.0))


def lgd(tf, dl, qtf, nt, F, N, avgdl, num_tokens, c=1.0):
    """LGD.java score()."""
    tf, dl, qtf, nt = _f64(tf, dl, qtf, nt)
    TF = tf * np.log2(1.0 + (c * avgdl) / dl)
    freq = nt / N
    return qtf * np.log2((freq + TF) / freq)


def dph(tf, dl, qtf, nt, F, N, avgdl, num_tokens):
    """DPH.java score() (parameter-free)."""
    tf, dl, qtf, F = _f64(tf, dl, qtf, F)
    with np.errstate(divide="ignore", invalid="ignore"):
        f = tf / dl
        norm = (1.0 - f) * (1.0 - f) / (tf + 1.0)
        return qtf * norm * (
            tf * np.log2((tf * avgdl / dl) * (N / F))
            + 0.5 * np.log2(2 * math.pi * tf * (1.0 - f))
        )


def dlh(tf, dl, qtf, nt, F, N, avgdl, num_tokens, k=0.5):
    """DLH.java score() (k=0.5)."""
    tf, dl, qtf, F = _f64(tf, dl, qtf, F)
    with np.errstate(divide="ignore", invalid="ignore"):
        f = tf / dl
        return qtf * (
            tf * np.log2((tf * avgdl / dl) * (N / F))
            + (dl - tf) * np.log2(1.0 - f)
            + 0.5 * np.log2(2 * math.pi * tf * (1.0 - f))
        ) / (tf + k)


def dlh13(tf, dl, qtf, nt, F, N, avgdl, num_tokens, k=0.5):
    """DLH13.java score() (k=0.5; DLH without the (dl-tf)log2(1-f) term)."""
    tf, dl, qtf, F = _f64(tf, dl, qtf, F)
    with np.errstate(divide="ignore", invalid="ignore"):
        f = tf / dl
        return qtf * (
            tf * np.log2((tf * avgdl / dl) * (N / F))
            + 0.5 * np.log2(2 * math.pi * tf * (1.0 - f))
        ) / (tf + k)


def in_expb2(tf, dl, qtf, nt, F, N, avgdl, num_tokens, c=1.0):
    """In_expB2.java score(): Bernoulli after-effect B with the
    n_exp = N(1-e^-f) expected-idf variant."""
    tf, dl, qtf, nt, F = _f64(tf, dl, qtf, nt, F)
    TF = tf * np.log2(1.0 + (c * avgdl) / dl)
    NORM = (F + 1.0) / (nt * (TF + 1.0))
    f = F / N
    n_exp = N * (1.0 - np.exp(-f))
    return TF * np.log2((N + 1.0) / (n_exp + 0.5)) * qtf * NORM


def ifb2(tf, dl, qtf, nt, F, N, avgdl, num_tokens, c=1.0):
    """IFB2.java score(): inverse-collection-frequency idf with
    Bernoulli after-effect B."""
    tf, dl, qtf, nt, F = _f64(tf, dl, qtf, nt, F)
    TF = tf * np.log2(1.0 + (c * avgdl) / dl)
    NORM = (F + 1.0) / (nt * (TF + 1.0))
    return TF * qtf * np.log2((N + 1.0) / (F + 0.5)) * NORM


def bm25f(ftf, fln, qtf, nt, N, weights, cs, avg_flens, k1=1.2, k3=8.0):
    """BM25F (matching/models/BM25F.java = PerFieldNormWeightingModel with
    BasicModel BM x NormalisationB, :118-133):

        tfn_i = w_i * tf_i / (1 - c_i + c_i * len_i/avg_len_i)   [tf_i>0]
        tfn   = sum_i tfn_i;  0 -> score 0
        score = (k3+1)qtf/(k3+qtf) * (k1+1)tfn/(k1+tfn)
                * log2((N - nt + 0.5)/(nt + 0.5))

    ftf/fln: (n_postings, n_fields) arrays; weights/cs/avg_flens:
    per-field vectors (defaults 1.0 per the w.<fi>/c.<fi> properties)."""
    ftf = np.asarray(ftf, dtype=np.float64)
    fln = np.asarray(fln, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    c = np.asarray(cs, dtype=np.float64)
    av = np.asarray(avg_flens, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        norm = 1.0 - c + c * fln / av
        tfn_i = np.where(ftf > 0, w * ftf / norm, 0.0)
    tfn = np.nan_to_num(tfn_i, nan=0.0, posinf=0.0).sum(axis=1)
    qk = (k3 + 1.0) * qtf / (k3 + qtf)
    idf = np.log2((N - float(nt) + 0.5) / (float(nt) + 0.5))
    score = qk * ((k1 + 1.0) * tfn / (k1 + tfn)) * idf
    return np.where(tfn == 0.0, 0.0, score)


@dataclass(frozen=True)
class ModelSpec:
    kernel: Callable
    prunable: bool  # monotone in tf (inc) and dl (dec): block-max safe
    needs_fields: bool = False  # scores from per-field tf/length vectors


MODELS: Dict[str, ModelSpec] = {
    "BM25": ModelSpec(bm25, True),
    "TF_IDF": ModelSpec(tf_idf, True),
    "DirichletLM": ModelSpec(dirichlet_lm, True),
    "Hiemstra_LM": ModelSpec(hiemstra_lm, True),
    "PL2": ModelSpec(pl2, False),   # TF*log2(TF) term is not monotone
    "InL2": ModelSpec(inl2, True),
    "LGD": ModelSpec(lgd, True),
    "DPH": ModelSpec(dph, False),
    "DLH": ModelSpec(dlh, False),
    "DLH13": ModelSpec(dlh13, False),
    # TF/(TF+1) increasing in TF and the rest constant per term -> monotone
    "In_expB2": ModelSpec(in_expb2, True),
    "IFB2": ModelSpec(ifb2, True),
    # field-aware: needs ftf/fln block vectors (per-field bounds are not
    # captured by (max_tf, min_dl), so no block-max pruning)
    "BM25F": ModelSpec(bm25f, False, needs_fields=True),
}


def get_model(name: str) -> ModelSpec:
    try:
        return MODELS[name]
    except KeyError:
        raise ValueError(
            f"unknown weighting model {name!r}; available: {sorted(MODELS)}"
        ) from None


def score_scalar(name: str, tf: float, dl: float, qtf: float, nt: int,
                 F: int, N: int, avgdl: float, num_tokens: int) -> float:
    out = get_model(name).kernel(
        np.array([tf]), np.array([dl]), np.array([qtf]), np.array([nt]),
        np.array([F]), N, avgdl, num_tokens
    )
    return float(out[0])
