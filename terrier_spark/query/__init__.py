from terrier_spark.query.search import search, process_queries

__all__ = ["search", "process_queries"]
