"""Iceberg persistence for index tables.

The north rule describes the index tables "persisted as Iceberg tables".
This sandbox's Spark distribution ships NO Iceberg runtime jars
(verified: no catalog plugin class org.apache.iceberg.spark.SparkCatalog
is loadable), so the engine's layout is Iceberg-SHAPED instead: each
structure (meta/docs, lexicon, postings) is an independent parquet
dataset and manifest.json plays the catalog/snapshot role (table
pointers, statistics, lineage, config) — see index/store.py.  On a
cluster with iceberg-spark-runtime on the classpath, `export_to_iceberg`
publishes the same tables through a real catalog; nothing in the engine
depends on the physical table format (IndexStore reads DataFrames).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from terrier_spark.index.store import IndexStore

INDEX_TABLES = ("meta", "lexicon", "postings")


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    """True when an Iceberg SparkCatalog is usable in this session."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def export_to_iceberg(spark: SparkSession, store: IndexStore,
                      namespace: str, catalog: str = "spark_catalog") -> None:
    """Publish the index tables as Iceberg tables
    `<catalog>.<namespace>.{meta,lexicon,postings}` (createOrReplace).
    Raises a clear error when the runtime is absent."""
    if not iceberg_available(spark, catalog):
        raise RuntimeError(
            "Iceberg runtime not on the Spark classpath (add "
            "iceberg-spark-runtime and a spark.sql.catalog.<name> "
            "configuration); this sandbox persists the same tables as "
            "parquet + manifest.json instead"
        )
    readers = {
        "meta": store.meta,
        "lexicon": store.lexicon,
        "postings": store.postings,
    }
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")
    for name in INDEX_TABLES:
        df = readers[name](spark)
        df.writeTo(f"{catalog}.{namespace}.{name}").using(
            "iceberg"
        ).createOrReplace()
