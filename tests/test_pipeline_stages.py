"""Explicit term-pipeline stage chains — the reference's `termpipelines`
property surface (structures/indexing/Indexer.java:275-308) with the
NoOp / CropTerm / DumpTerm / SkipTermPipeline stages (org/terrier/terms/
{CropTerm,DumpTerm,SkipTermPipeline}.java)."""

import pytest

from terrier_spark.config import PipelineConfig
from terrier_spark.text.pipeline import make_pipeline


def test_default_chain_equals_explicit_reference_names():
    default = make_pipeline(PipelineConfig())
    explicit = make_pipeline(
        PipelineConfig(stages=("Stopwords", "PorterStemmer"))
    )
    text = "The running dogs are chasing the conflated cats"
    assert default.terms(text) == explicit.terms(text)


def test_stage_order_matters():
    # stemming before stopword removal keeps 'this' (stems to 'thi',
    # no longer in the stopword list) — the reference's order caveat
    fwd = make_pipeline(PipelineConfig(stages=("Stopwords", "porter")))
    rev = make_pipeline(PipelineConfig(stages=("porter", "Stopwords")))
    assert fwd.terms("this running") == ["run"]
    assert rev.terms("this running") == ["thi", "run"]


def test_cropterm_keeps_overlong_terms_truncated():
    long = "abcde" * 6  # 30 chars, no 4-consecutive-chars violation
    # default chain: tokeniser DROPS terms over max_term_length
    assert make_pipeline(PipelineConfig(stem=False, stopwords=None)).terms(
        long
    ) == []
    pipe = make_pipeline(PipelineConfig(stages=("CropTerm",)))
    assert pipe.terms(long) == [long[:20]]


def test_skiptermpipeline_bypasses_rest_of_chain():
    pipe = make_pipeline(
        PipelineConfig(stages=("SkipTermPipeline:running", "Stopwords",
                               "porter"))
    )
    # 'running' bypasses stemming; 'jumping' is stemmed; 'the' dropped
    assert pipe.terms("the running jumping") == ["running", "jump"]


def test_noop_and_dump_pass_through():
    base = make_pipeline(PipelineConfig(stages=("Stopwords", "porter")))
    wrapped = make_pipeline(
        PipelineConfig(stages=("NoOp", "Stopwords", "DumpTerm", "porter"))
    )
    text = "the conflated observations"
    assert base.terms(text) == wrapped.terms(text)


def test_unknown_stage_raises():
    with pytest.raises(ValueError, match="unknown pipeline stage"):
        make_pipeline(PipelineConfig(stages=("NotAStage",))).terms("x")


def test_multilingual_stage_by_reference_class_name():
    pipe = make_pipeline(
        PipelineConfig(stopwords=None,
                       stages=("GermanSnowballStemmer",))
    )
    assert pipe.terms("aufeinander") == ["aufeinand"]


def test_stages_survive_manifest_roundtrip(spark, tmp_path):
    from terrier_spark.config import IndexConfig
    from terrier_spark.index.builder import build_index
    from terrier_spark.index.corpus import synth_source_corpus
    from terrier_spark.index.store import IndexStore

    cfg = IndexConfig(
        pipeline=PipelineConfig(stages=("Stopwords", "CropTerm", "porter"))
    )
    corpus = synth_source_corpus(spark, n_docs=40)
    build_index(spark, corpus, str(tmp_path / "st"), cfg, bucket_span=64)
    got = IndexStore(str(tmp_path / "st")).pipeline_config()
    assert got.stages == ("Stopwords", "CropTerm", "porter")
    # and the reloaded pipeline behaves identically
    long = "abcde" * 5  # 25 chars, crops to 20 then stems
    assert make_pipeline(got).terms(long) == [
        make_pipeline(got).terms(long[:20])[0]
    ]


def test_empty_stage_chain_is_identity_not_default():
    """stages=() is an EXPLICIT empty chain: tokens pass through
    unprocessed, and the pipeline cache must not collapse it onto the
    default Stopwords+Porter pipeline (they share every other key
    field)."""
    default = make_pipeline(PipelineConfig())
    empty = make_pipeline(PipelineConfig(stages=()))
    assert default is not empty
    assert default.terms("the running dogs") == ["run", "dog"]
    assert empty.terms("the running dogs") == ["the", "running", "dogs"]
    # and the same in the opposite construction order (fresh configs,
    # same cache)
    assert make_pipeline(PipelineConfig(stages=())).terms("the cats") == [
        "the", "cats"
    ]
    assert make_pipeline(PipelineConfig()).terms("the cats") == ["cat"]
