"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline: the dot product stays
JVM-side (F.zip_with + F.aggregate — no Python in the hot path), query
vectors broadcast, top-k per query via window.  The scale path is
random-hyperplane LSH bucketing: each vector hashes to a signature from
the signs of `planes` fixed random projections; candidates come from a
bucket join (multi-probe over all band rotations), then exact cosine on
candidates only.
"""

from __future__ import annotations

import random
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # cast BEFORE multiplying: float32*float32 in float32 loses the bits
    # numpy/DuckDB (double accumulation) keep
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: Sequence[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k for each query id
    -> (query_id, vec_id, cosine) ranked desc, self-match excluded,
    ties broken by vec_id asc."""
    q = (
        emb.filter(F.col(id_col).isin(list(query_ids)))
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    joined = emb.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    cos = _dot(F.col(vec_col), F.col("qvec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("qvec"))
    )
    scored = joined.select(
        "query_id", F.col(id_col).alias("vec_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = True,
    n_planes: int = 12,
    bands: int = 6,
    seed: int = 13,
    dim: int | None = None,
    max_bucket_size: int | None = 1024,
    stats_out: dict | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs -> (id_a, id_b, cosine) with
    id_a < id_b and cosine >= threshold.

    Scale path: random-hyperplane LSH band buckets generate candidates
    (bucket join), exact cosine verifies — with enough bands recall at
    high thresholds is ~1 (two vectors at cosine 0.9 disagree on a
    hyperplane with p = acos(0.9)/pi ≈ 0.14; P(no shared band) =
    (1-(1-p)^2)^6 ≈ 2e-4).  use_lsh=False does the exact O(N^2)
    self-join (the oracle path for small N)."""
    if use_lsh:
        if dim is None:
            dim = len(emb.select(vec_col).first()[0])
        sigs = lsh_signatures(emb, dim, n_planes, seed, id_col, vec_col)
        width = n_planes // bands
        banded = sigs.select(
            "id", "vec",
            F.explode(F.array(*[
                F.concat(F.lit(f"{i}:"),
                         F.substring("sig", i * width + 1, width))
                for i in range(bands)
            ])).alias("band_key"),
        )
        if max_bucket_size is not None:
            # a corpus of near-identical vectors collapses into one band
            # bucket (b^2/2 candidates); drop degenerate buckets loudly
            from terrier_spark.datapipe.dedup import _cap_buckets

            banded = _cap_buckets(banded, ["band_key"], max_bucket_size,
                                  stats_out, "embedding_lsh_buckets")
        cands = (
            banded.alias("x").join(banded.alias("y"), "band_key")
            .filter(F.col("x.id") < F.col("y.id"))
            .select(
                F.col("x.id").alias("id_a"), F.col("x.vec").alias("va"),
                F.col("y.id").alias("id_b"), F.col("y.vec").alias("vb"),
            )
            .distinct()
        )
    else:
        lhs = emb.select(F.col(id_col).alias("id_a"),
                         F.col(vec_col).alias("va"))
        rhs = emb.select(F.col(id_col).alias("id_b"),
                         F.col(vec_col).alias("vb"))
        cands = lhs.crossJoin(rhs).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        cands.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _planes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_signatures(emb: DataFrame, dim: int, n_planes: int = 16,
                   seed: int = 13, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """-> (id, sig string of 0/1 signs).  Projections are pure Column
    expressions over the fixed plane constants — JVM-side, codegen'd."""
    planes = _planes(dim, n_planes, seed)
    bits = []
    for p in planes:
        proj = _dot(F.col(vec_col), F.array(*[F.lit(x) for x in p]))
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.concat(*bits).alias("sig"),
    )


def ivf_centroids(emb: DataFrame, n_centroids: int = 8, iters: int = 5,
                  sample: int = 2000, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """Deterministic coarse-quantizer centroids for IVF: k-means on a
    deterministic sample (the `sample` lowest ids, sorted), run
    driver-side in numpy with fixed initialisation (first n_centroids
    sample vectors) and a fixed iteration count.  Driver-side k-means is
    deliberate: centroid training on a 10^12-row table would subsample
    anyway, and a numpy loop over a bounded sample is reproducible
    bit-for-bit across engines (the DuckDB gate oracle inlines the
    resulting centroid constants).  -> (n_centroids, dim) float64."""
    import numpy as np

    rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    )
    x = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = x[:n_centroids].copy()
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_anchors(dim: int, n_centroids: int = 8, seed: int = 29):
    """Data-independent IVF anchors: seeded Gaussian unit vectors.
    Slightly worse recall than trained k-means centroids
    (ivf_centroids) but reproducible from the seed alone, so the DuckDB
    gate oracle can inline them as constants."""
    rng = random.Random(seed)
    out = []
    for _ in range(n_centroids):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = sum(x * x for x in v) ** 0.5
        out.append([x / n for x in v])
    return out


def ivf_assign(emb: DataFrame, centroids, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """-> (id, vec, centroid) with centroid = argmax cosine against the
    fixed centroid constants — pure Column expressions (ordered sums, so
    any engine computing the same fold agrees), JVM-side."""
    cents = [list(map(float, c)) for c in centroids]
    sims = [
        _dot(F.col(vec_col), F.array(*[F.lit(x) for x in c])) for c in cents
    ]
    best = F.lit(0)
    best_sim = sims[0]
    for ci in range(1, len(sims)):
        cond = sims[ci] > best_sim
        best = F.when(cond, F.lit(ci)).otherwise(best)
        best_sim = F.when(cond, sims[ci]).otherwise(best_sim)
    return emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        best.alias("centroid"),
    )


def ivf_cosine_topk(
    emb: DataFrame,
    query_ids: Sequence[int],
    centroids,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k: vectors are bucketed by nearest
    centroid (the inverted file); each query probes its `nprobe` nearest
    centroids' buckets and exact-scores only those candidates.
    -> (query_id, vec_id, cosine).  The standard ANN scale path: the
    candidate set shrinks by ~n_centroids/nprobe versus brute force, and
    the bucket join shuffles candidates only.

    max_bucket_size guards against a mass-duplicated corpus collapsing
    into one centroid's inverted list (the same skew guard the LSH dedup
    paths carry): hot buckets are TRUNCATED to the cap lowest ids — not
    dropped, a probing query still needs candidates — with the dropped
    counts recorded in stats_out['ivf_buckets']."""
    import numpy as np

    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    if max_bucket_size is not None:
        from terrier_spark.datapipe.dedup import _truncate_buckets

        assigned = _truncate_buckets(assigned, ["centroid"],
                                     max_bucket_size, stats_out,
                                     "ivf_buckets")
    qvecs = {
        int(r[0]): np.asarray(list(r[1]), dtype=np.float64)
        for r in emb.filter(F.col(id_col).isin(list(query_ids)))
        .select(id_col, vec_col).collect()
    }
    cents = [list(map(float, c)) for c in centroids]
    probe_rows = []
    for qid_, v in qvecs.items():
        vf = [float(x) for x in v]
        # left-to-right fold, matching the SQL oracle's ordered sums
        # bit-for-bit so probe tie-breaks agree across engines
        sims = []
        for c in cents:
            acc = 0.0
            for x, y in zip(vf, c):
                acc = acc + x * y
            sims.append(acc)
        # deterministic probe order: similarity desc, centroid id asc
        order = sorted(range(len(cents)), key=lambda ci: (-sims[ci], ci))
        for ci in order[:nprobe]:
            probe_rows.append((qid_, int(ci)))
    probes = emb.sparkSession.createDataFrame(
        probe_rows, "query_id long, centroid int"
    )
    q = emb.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cands = (
        assigned.join(F.broadcast(probes), "centroid")
        .join(F.broadcast(q), "query_id")
        .filter(F.col("id") != F.col("query_id"))
    )
    cos = _dot(F.col("vec"), F.col("qvec")) / (
        _norm(F.col("vec")) * _norm(F.col("qvec"))
    )
    scored = cands.select(
        "query_id", F.col("id").alias("vec_id"), cos.alias("cosine")
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine")
    )


def lsh_cosine_topk(
    emb: DataFrame,
    query_ids: Sequence[int],
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates = vectors sharing at least
    one LSH band with the query, then exact cosine on candidates.
    -> (query_id, vec_id, cosine).  Recall grows with bands/planes;
    tests measure it against cosine_topk.  max_bucket_size truncates
    degenerate band buckets to the cap lowest ids (see ivf_cosine_topk;
    the query side is taken BEFORE truncation so queries always probe)."""
    sigs = lsh_signatures(emb, dim, n_planes, seed, id_col, vec_col)
    width = n_planes // bands
    banded = sigs.select(
        "id", "vec",
        F.explode(F.array(*[
            F.concat(F.lit(f"{i}:"), F.substring("sig", i * width + 1, width))
            for i in range(bands)
        ])).alias("band_key"),
    )
    qb = banded.filter(F.col("id").isin(list(query_ids))).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec"), "band_key"
    )
    if max_bucket_size is not None:
        from terrier_spark.datapipe.dedup import _truncate_buckets

        banded = _truncate_buckets(banded, ["band_key"], max_bucket_size,
                                   stats_out, "lsh_topk_buckets")
    cands = (
        banded.join(F.broadcast(qb), "band_key")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "qvec", F.col("id").alias("vec_id"), "vec")
        .distinct()
    )
    cos = _dot(F.col("vec"), F.col("qvec")) / (
        _norm(F.col("vec")) * _norm(F.col("qvec"))
    )
    scored = cands.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine")
    )
