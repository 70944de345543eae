"""Engine configuration.

The reference configures everything through a global properties file
(org/terrier/utility/ApplicationSetup.java) with reflection-based plugin
loading; here the same knobs are plain dataclasses (SURVEY.md §1.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional, Sequence


# Default stopword list committed to the repo (FIXTURES.md §2) so tests never
# depend on an external stopword-list.txt.  Reference format: one word per
# line (org/terrier/terms/Stopwords.java:118-149).
DEFAULT_STOPWORDS: tuple[str, ...] = (
    "the", "of", "and", "a", "in", "to", "is", "was", "it", "for",
    "with", "as", "be", "on", "not", "he", "this", "are", "or", "his",
    "from", "at", "which", "but", "have", "an", "had", "they", "you",
    "were",
)


@dataclass(frozen=True)
class PipelineConfig:
    """Tokenizer + term-pipeline knobs.

    Defaults mirror the reference:
      * max_term_length = 20   (org/terrier/utility/ApplicationSetup.java:459)
      * max_digits = 4, max_conseq = 3, lowercase
        (org/terrier/indexing/tokenisation/EnglishTokeniser.java:61-74,155-181)
      * default pipeline "Stopwords,PorterStemmer"
        (org/terrier/structures/indexing/Indexer.java:275-279)
    """

    max_term_length: int = 20
    max_digits: int = 4
    max_conseq: int = 3
    lowercase: bool = True
    stopwords: Optional[Sequence[str]] = DEFAULT_STOPWORDS
    stem: bool = True  # PorterStemmer on/off (classic default chain)
    # Stemmer registry name overriding the boolean: one of
    # "porter" (classic, terms/PorterStemmer.java),
    # "weak_porter" (terms/WeakPorterStemmer.java — step 1 only),
    # "trv2_porter" / "trv2_weak_porter" (terms/TRv2PorterStemmer.java,
    #   TRv2WeakPorterStemmer.java — Amati's Terrier-v2 variants),
    # "snowball_en" (terms/EnglishSnowballStemmer.java — Porter2),
    # "none".  None -> derive from `stem`.
    stemmer: Optional[str] = None
    # Tokeniser class (indexing/tokenisation/*Tokeniser.java):
    # "english" ([A-Za-z0-9] runs), "utf" (Unicode letter/digit classes,
    # UTFTokeniser.java), "identity" (whole input as one token,
    # IdentityTokeniser.java).
    tokeniser: str = "english"
    # Explicit term-pipeline chain, the reference's `termpipelines`
    # property (structures/indexing/Indexer.java:275-308): an ordered
    # tuple of stage names replacing the default Stopwords->Stemmer
    # chain.  Accepts reference class names or registry short names:
    # "Stopwords", any STEMMERS key or *Stemmer class name, "NoOp"
    # (terms/NoOpTermPipeline? -- identity), "CropTerm"
    # (terms/CropTerm.java: crop overlong terms to max_term_length
    # instead of dropping them), "DumpTerm" (terms/DumpTerm.java: log
    # and pass through), and "SkipTermPipeline:w1,w2" (terms/
    # SkipTermPipeline.java: the listed terms bypass the rest of the
    # chain unchanged).  None -> the stopwords/stem knobs above.
    stages: Optional[tuple] = None

    def key(self) -> tuple:
        sw = tuple(sorted(self.stopwords)) if self.stopwords else ()
        # stages=() is an EXPLICIT empty chain (identity pipeline), not
        # the default chain: only stages=None may collapse to None here,
        # or the two collide in the make_pipeline cache
        return (self.max_term_length, self.max_digits, self.max_conseq,
                self.lowercase, sw, self.stem, self.stemmer, self.tokeniser,
                tuple(self.stages) if self.stages is not None else None)


# A pipeline that can be mirrored exactly in ANSI SQL (DuckDB oracle): the
# tokenizer validity rules are regex-expressible, stopwords are a literal
# IN-list, and there is no stemmer.  Used by the driver correctness gate.
SQL_SAFE_PIPELINE = PipelineConfig(stem=False)


@dataclass(frozen=True)
class BM25Config:
    """Terrier's BM25 variant (org/terrier/matching/models/BM25.java:43-74).

    K     = k1*((1-b) + b*doclen/avgdl) + tf
    score = tf*(k3+1)*qtf / ((k3+qtf)*K) * log2((N - Nt + 0.5)/(Nt + 0.5))

    No (k1+1) numerator factor; log base 2
    (WeightingModelLibrary.java:40-60).
    """

    k1: float = 1.2
    k3: float = 8.0
    b: float = 0.75


@dataclass(frozen=True)
class IndexConfig:
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    # Posting-block chunk size, as the reference's chunked integer codec
    # (org/terrier/structures/integer/IntegerCodecCompressionConfiguration.java:63,145).
    block_size: int = 1024
    # Number of salt buckets for the two-phase (term, salt) pre-aggregation
    # that absorbs hot-term skew before the final merge by term.
    shuffle_partitions: int = 32
    # Assign docids in (sort_docids_by) order instead of ingest order --
    # the Spark-native analog of the fork's docid-reordering experiments
    # (org/terrier/applications/InvertedIndexReordering.java:114-140).
    sort_docids_by: Optional[Sequence[str]] = None
    # Store per-posting position arrays ("blocks",
    # org/terrier/structures/indexing/classical/BlockIndexer.java:84-99):
    # enables index-backed phrase/proximity at ~1-2 bytes/token extra.
    positions: bool = False
    # Ordered (field_name, corpus_column) pairs.  When set, each document
    # is tokenized per field (streams concatenated in this order for
    # positions/doclen, as the reference's FieldTags processing,
    # org/terrier/utility/FieldScore.java:54-86) and postings carry
    # per-field tf + field-length vectors, enabling BM25F and field
    # restriction.  E.g. (("path", "path"), ("content", "content")).
    field_cols: Optional[tuple] = None


@dataclass(frozen=True)
class QueryConfig:
    bm25: BM25Config = field(default_factory=BM25Config)
    # weighting model name from terrier_spark.query.models.MODELS (the
    # reference's trec.model property / WeightingModelFactory surface)
    model: str = "BM25"
    # matching.retrieved_set_size default (org/terrier/matching/BaseMatching.java:283-284)
    k: int = 1000
    # Drop query terms whose collection frequency exceeds N
    # (org/terrier/matching/PostingListManager.java:217-219, default on in
    # this fork's version).
    ignore_low_idf: bool = True
    # Block-max WAND-style pruning on/off; results must be identical either
    # way (bound-safe pruning).
    prune: bool = True
    # Consume the exact per-block max-score metadata stored at compaction
    # time (index/maxscore.py) when present/valid — extends bound-safe
    # pruning to non-monotone models (PL2, DPH, DLH, ...) and tightens it
    # for monotone ones.  Off -> only the analytic (max_tf, min_dl) /
    # field bounds are used.  Results are identical either way.
    use_exact_maxscore: bool = True
    # Pruning pays only when there are enough candidate postings to skip:
    # below this total (sum of query-term document frequencies) the
    # two-pass bound computation costs more than the decode it avoids, so
    # search falls back to the exhaustive plan.
    prune_min_postings: int = 100_000
    # ... and only when the corpus spans enough docid buckets for block
    # granularity to matter: with ceil(num_docs / bucket_span) below
    # this floor, pass 1 already decodes a large fraction of the corpus
    # to bound theta and pass 2 has almost nothing left to skip, so the
    # two-pass overhead is pure loss (measured 1.7-2.2x slower than the
    # exhaustive plan on a 5-bucket corpus).  At production scale
    # (10^6+ docs) any sane bucket_span clears this by orders of
    # magnitude; tests that exercise the prune on tiny fixtures set 0.
    prune_min_buckets: int = 16
    # Below this many queries in a batch, the two-pass block-max prune
    # keeps its survivor set lazy (folded into the main job) instead of
    # eagerly materializing it: the eager path costs one extra Spark
    # action (~0.3-0.7 s fixed overhead on this box), which doubles
    # single-query latency while being a win amortized over a 900-query
    # batch (where the persisted bucket-bound frame is reused).
    prune_eager_min_queries: int = 64
    # Up to this many queries per batch, the decode kernel aggregates
    # scores itself (partition-local sums are final under the
    # (qid, bucket) co-partitioning) and applies the theta bound plus a
    # per-partition top-k cut — one exchange fewer, which wins on
    # interactive latency.  Above it, the kernel emits per-posting
    # scores and Spark's whole-stage-codegen hash aggregation owns the
    # accumulation (spillable, so safest for mega-batches).  The
    # threshold was 32 when the in-kernel combine was a pandas groupby
    # over string-keyed rows (the JVM agg beat that ~3x at 900
    # queries); with dense int32 qid codes and the packed-key numpy
    # combine it is the other way around — A/B on the 500k-doc topical
    # corpus, 900 warm queries, best-of-3: k=1000 9.5 s in-kernel vs
    # 18.2 s JVM agg (every in-kernel rep beat the JVM best), k=10
    # parity (pruning already removed the agg volume), exact-row
    # identical results.  The per-posting exchange + two-phase hash agg
    # only pays for itself beyond the chunking cap anyway.
    agg_in_decode_max_queries: int = 1024
    # Bounded-memory batch execution: when the estimated score-cell
    # count of a batch (sum over queries of their terms' document
    # frequencies = rows entering the aggregation) exceeds this cap,
    # the batch splits into query chunks run as sequential jobs with
    # eagerly-materialized (<= k rows/query) results, so aggregation
    # state per job stays bounded no matter how degenerate the
    # query/corpus combination is.  None disables chunking.
    batch_max_score_cells: Optional[float] = 1e9
    # Per-field weights / NormalisationB c parameters for BM25F, aligned
    # with the index's field order; None -> all 1.0 (the reference's
    # w.<fi> / c.<fi> property defaults,
    # matching/models/PerFieldNormWeightingModel.java:147-155).
    field_weights: Optional[tuple] = None
    field_c: Optional[tuple] = None


def with_pipeline(cfg: IndexConfig, pipeline: PipelineConfig) -> IndexConfig:
    return replace(cfg, pipeline=pipeline)
