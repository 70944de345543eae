"""terrier_spark — a PySpark-native full-text indexing + BM25 retrieval engine.

A from-scratch, Spark-first re-expression of the capabilities of the
Terrier 4.0 research fork at /root/reference (Sparklexs/Terrier):
inverted-index build (tokenize -> per-partition shard pre-aggregation ->
salted shuffle-merge -> global lexicon + delta-gap VByte posting store),
and BM25 DAAT top-k retrieval with block-max (WAND-style) pruning,
rank-identical to the reference semantics.

Nothing here is a port: the reference is a single-JVM Java engine; this
package declares logical plans with the DataFrame API and lets Catalyst/
Tungsten choose physical execution, dropping to Arrow-vectorized pandas
UDFs only for the domain kernels Spark lacks (tokenization, Porter
stemming, VByte posting codecs).
"""

__version__ = "0.1.0"
