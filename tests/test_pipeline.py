"""Default term-pipeline goldens: tokenize -> Stopwords -> PorterStemmer
(Indexer.java:275-279; stop BEFORE stem, Stopwords.java:172-177)."""

from terrier_spark.config import DEFAULT_STOPWORDS, PipelineConfig
from terrier_spark.text.pipeline import make_pipeline


def test_default_chain_order():
    pipe = make_pipeline()
    # "this" is a stopword -> dropped before stemming; "running" stems to "run"
    assert pipe.terms("This is running code") == ["run", "code"]


def test_stopword_removed_before_stemming():
    # "was" is a stopword; if stemming ran first it would become "wa" and
    # escape the stop list — pin the order.
    pipe = make_pipeline()
    assert pipe.terms("was wases") == ["wase"]


def test_stopword_only_document_is_empty():
    pipe = make_pipeline()
    assert pipe.terms("the of and a in to") == []


def test_query_uses_same_pipeline():
    pipe = make_pipeline()
    assert pipe.query_terms("Conditional Relational") == pipe.terms(
        "conditional relational"
    )


def test_no_stem_config():
    pipe = make_pipeline(PipelineConfig(stem=False))
    assert pipe.terms("running the tests") == ["running", "tests"]


def test_no_stopwords_config():
    pipe = make_pipeline(PipelineConfig(stopwords=None, stem=False))
    assert pipe.terms("the code") == ["the", "code"]


def test_default_stopwords_are_fixtures_list():
    assert "the" in DEFAULT_STOPWORDS and len(DEFAULT_STOPWORDS) == 30
