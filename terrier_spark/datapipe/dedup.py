"""Deduplication operators.

All cross-doc similarity work is expressed as shingle inverted-index
joins (never an O(N^2) cross join): explode shingles, join docs that
share a shingle/band-bucket, aggregate.  Hashes are md5-derived 60-bit
ints computed JVM-side (F.md5 + F.conv) so the exact same values are
reproducible in any engine (the DuckDB oracles mirror them) and no
Python-hash nondeterminism leaks in.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# 60-bit md5-int: conv(first 15 hex chars) -> non-negative < 2^60
MERSENNE31 = (1 << 31) - 1


def _canonical_texts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One representative row (min id) per distinct text.  Running LSH on
    canonical texts only is the standard guard against mass duplication:
    1M byte-identical docs would otherwise all land in the same band
    bucket (~10^12 candidate pairs); byte-identical groups are already
    reported exactly by exact_duplicates()."""
    w = Window.partitionBy(F.md5(F.col(text_col)))
    return (
        df.withColumn("__min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__min_id"))
        .drop("__min_id")
    )


def _cap_buckets(buckets: DataFrame, keys: list[str], cap: int,
                 stats_out: dict | None, what: str) -> DataFrame:
    """Drop bucket groups larger than `cap` members (a hot bucket of b
    docs yields b^2/2 candidate pairs — one pathological bucket can
    dominate the whole job).  When `stats_out` is given, the dropped
    counts are computed eagerly (one small aggregation job) and recorded
    under stats_out[what]; a warning is logged either way."""
    sizes = buckets.groupBy(*keys).agg(F.count("*").alias("__bn"))
    if stats_out is not None:
        row = (
            sizes.filter(F.col("__bn") > cap)
            .agg(
                F.count("*").alias("dropped_buckets"),
                F.coalesce(F.sum("__bn"), F.lit(0)).alias("dropped_rows"),
                F.coalesce(F.max("__bn"), F.lit(0)).alias("max_bucket"),
            )
            .collect()[0]
        )
        stats_out[what] = {
            "dropped_buckets": int(row["dropped_buckets"]),
            "dropped_rows": int(row["dropped_rows"]),
            "max_bucket": int(row["max_bucket"]),
            "cap": cap,
        }
        if row["dropped_buckets"]:
            log.warning(
                "%s: dropped %d bucket(s) over cap=%d (largest had %d "
                "members, %d rows total)", what, row["dropped_buckets"],
                cap, row["max_bucket"], row["dropped_rows"],
            )
    ok = sizes.filter(F.col("__bn") <= cap).select(*keys)
    return buckets.join(ok, keys, "left_semi")


def _truncate_buckets(buckets: DataFrame, keys: list[str], cap: int,
                      stats_out: dict | None, what: str,
                      order_col: str = "id") -> DataFrame:
    """Keep only the `cap` lowest-`order_col` members of each bucket
    group (deterministic subset).  The search-path sibling of
    _cap_buckets: a pair-generation job can DROP a degenerate bucket
    loudly, but an ANN query probing that bucket still needs candidates,
    so the hot bucket is truncated rather than removed.  Counters
    recorded under stats_out[what] mirror _cap_buckets."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    ranked = buckets.withColumn("__br", F.row_number().over(w))
    if stats_out is not None:
        row = (
            ranked.groupBy(*keys).agg(F.max("__br").alias("__bn"))
            .filter(F.col("__bn") > cap)
            .agg(
                F.count("*").alias("truncated_buckets"),
                F.coalesce(F.sum("__bn") - F.count("*") * cap,
                           F.lit(0)).alias("dropped_rows"),
                F.coalesce(F.max("__bn"), F.lit(0)).alias("max_bucket"),
            )
            .collect()[0]
        )
        stats_out[what] = {
            "truncated_buckets": int(row["truncated_buckets"]),
            "dropped_rows": int(row["dropped_rows"]),
            "max_bucket": int(row["max_bucket"]),
            "cap": cap,
        }
        if row["truncated_buckets"]:
            log.warning(
                "%s: truncated %d bucket(s) to cap=%d (largest had %d "
                "members; %d candidate rows dropped)", what,
                row["truncated_buckets"], cap, row["max_bucket"],
                row["dropped_rows"],
            )
    return ranked.filter(F.col("__br") <= cap).drop("__br")


def _md5_int(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash -> (text_hash, n_docs, canonical_id)
    for groups with more than one member; canonical = min id."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct token n-gram shingles per doc (whitespace tokens,
    lowercased) -> (id, shingle string)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int | None = None,
                        stats_out: dict | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted join:
    |A ∩ B| from the self-join on shingle, |A ∪ B| = |A|+|B|-|A∩B|.
    -> (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.

    SCALE WARNING: a shingle shared by d docs contributes d^2/2 join
    rows; at web scale a boilerplate 3-gram appears in millions of docs
    and the bare self-join degenerates to a cartesian product on that
    key.  Set `max_shingle_df` to drop shingles above that document
    frequency BEFORE the join (the standard df-cut — both intersections
    and set sizes are computed over the reduced shingle universe, so the
    Jaccard stays a proper set similarity of that universe).  The exact
    unfiltered path (max_shingle_df=None) is intended for oracle-scale
    inputs or as the verify stage behind minhash_lsh_pairs, which routes
    candidates through LSH buckets first."""
    sh = _shingles(df, id_col, text_col, n)
    if max_shingle_df is not None:
        # df-cut: the per-shingle document-frequency aggregation and the
        # semi-join reuse the distinct()'s exchange (same subtree)
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
        if stats_out is not None:
            row = (
                dfreq.filter(F.col("__df") > max_shingle_df)
                .agg(
                    F.count("*").alias("dropped_shingles"),
                    F.coalesce(F.max("__df"), F.lit(0)).alias("max_df"),
                )
                .collect()[0]
            )
            stats_out["shingle_df_cut"] = {
                "dropped_shingles": int(row["dropped_shingles"]),
                "max_df": int(row["max_df"]),
                "cap": max_shingle_df,
            }
            if row["dropped_shingles"]:
                log.warning(
                    "ngram_jaccard_pairs: df-cut dropped %d hot shingle(s) "
                    "(max df %d > cap %d)", row["dropped_shingles"],
                    row["max_df"], max_shingle_df,
                )
        ok = dfreq.filter(F.col("__df") <= max_shingle_df).select("shingle")
        sh = sh.join(ok, "shingle", "left_semi")
        persisted = None
    else:
        # the exact path feeds sh into THREE subtrees (sizes + both
        # sides of the self-join): cache it for the duration of the
        # pair computation so shingling/distinct runs once, and
        # localCheckpoint the result so the cache can be released
        # before returning (the returned frame no longer references sh)
        persisted = sh = sh.persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if persisted is not None:
        out = out.localCheckpoint()  # materializes while sh is cached
        persisted.unpersist()
    return out


def _hash_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the affine hash family
    h_i(x) = (a_i * (x mod p) + b_i) mod p, p = 2^31 - 1.  Kept < 2^31 so
    a*h + b < 2^62 never overflows signed 64-bit in ANY engine."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31))
        for _ in range(num_hashes)
    ]


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_hashes: int = 64, seed: int = 7) -> DataFrame:
    """-> (id, sig array<long> of length num_hashes).  One row per
    shingle in the shuffle; the 64 mins are computed as 64 aggregate
    expressions over the SAME exploded rows (no 64x blow-up)."""
    params = _hash_params(num_hashes, seed)
    sh = _shingles(df, id_col, text_col, n)
    base = sh.withColumn("h", _md5_int(F.col("shingle")) % MERSENNE31)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE31).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = base.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.5, seed: int = 7,
                      verify_exact: bool = True,
                      dedup_exact_first: bool = True,
                      max_bucket_size: int | None = 1024,
                      stats_out: dict | None = None) -> DataFrame:
    """MinHash + LSH near-dup candidate generation:
    shingle -> minhash signature -> band buckets -> bucket join.

    With verify_exact, candidates are re-checked with exact n-gram
    Jaccard (the standard verify step) -> (id_a, id_b, jaccard) — at
    scale the exact check touches only candidate pairs, not N^2.

    Mass-duplication guards (both deterministic, mirrored by the DuckDB
    gate oracle): `dedup_exact_first` runs LSH on one canonical
    representative (min id) per distinct text — byte-identical groups
    are exact_duplicates()'s job and would otherwise square inside their
    shared buckets; `max_bucket_size` drops degenerate band buckets
    above that membership with a logged counter."""
    if dedup_exact_first:
        df = _canonical_texts(df, id_col, text_col)
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, seed)
    band_idx = F.explode(
        F.sequence(F.lit(0), F.lit(bands - 1))
    ).alias("band")
    buckets = sig.select("id", "sig", band_idx).select(
        "id",
        "band",
        F.md5(
            F.concat_ws(
                ",",
                F.col("band"),
                F.concat_ws(
                    ",", F.slice("sig", F.col("band") * rows_per_band + 1,
                                 rows_per_band)
                ),
            )
        ).alias("bucket"),
    )
    if max_bucket_size is not None:
        buckets = _cap_buckets(buckets, ["band", "bucket"], max_bucket_size,
                               stats_out, "minhash_lsh_buckets")
    cands = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    if not verify_exact:
        return cands
    # exact-verify via shingle join restricted to candidate pairs
    sh = _shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a_sh = sh.select(F.col("id").alias("id_a"), "shingle")
    b_sh = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        cands.join(a_sh, "id_a").join(b_sh, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash_fingerprints(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash over whitespace tokens weighted by tf:
    bit_j(doc) = sign of sum over tokens of tf * (+1 if bit j of
    h(token) else -1).  Pure DataFrame: explode -> per-(doc, token) tf ->
    per-bit contributions via bit arithmetic -> groupBy(doc).

    -> (id, simhash long)."""
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
            .alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", _md5_int(F.col("tok")))
    )
    # signed contribution per bit: tf if bit set else -tf
    contribs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                   F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"b{j}")
        for j in range(min(bits, 60))
    ]
    agg = toks.groupBy("id").agg(*contribs)
    fp = F.lit(0).cast("long")
    for j in range(min(bits, 60)):
        fp = fp + F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return agg.select("id", fp.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3,
                       bands: int = 4,
                       dedup_exact_first: bool = True,
                       max_bucket_size: int | None = 1024,
                       stats_out: dict | None = None) -> DataFrame:
    """Near-dup pairs by SimHash within `max_hamming` bits, using the
    pigeonhole band trick (a pair within r bits shares at least one of
    r+1 bands exactly) — a bucket join, not a cross join.  Same
    mass-duplication guards as minhash_lsh_pairs."""
    if dedup_exact_first:
        df = _canonical_texts(df, id_col, text_col)
    fp = simhash_fingerprints(df, id_col, text_col)
    nbands = max(bands, max_hamming + 1)
    width = 60 // nbands
    pieces = fp.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(i),
                        (F.shiftright("simhash", i * width)
                         .bitwiseAND(F.lit((1 << width) - 1))).cast("string"))
            for i in range(nbands)
        ])).alias("band_key"),
    )
    if max_bucket_size is not None:
        pieces = _cap_buckets(pieces, ["band_key"], max_bucket_size,
                              stats_out, "simhash_buckets")
    cands = (
        pieces.alias("x").join(pieces.alias("y"), "band_key")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("fa"), F.col("y.simhash").alias("fb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
