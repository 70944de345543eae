from terrier_spark.text.tokenizer import tokenize, check_term
from terrier_spark.text.porter import porter_stem
from terrier_spark.text.pipeline import TermPipeline, make_pipeline

__all__ = ["tokenize", "check_term", "porter_stem", "TermPipeline", "make_pipeline"]
