from terrier_spark.index.builder import build_index
from terrier_spark.index.store import IndexStore

__all__ = ["build_index", "IndexStore"]
