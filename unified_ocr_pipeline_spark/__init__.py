"""unified_ocr_pipeline_spark — a PySpark-native document-extraction engine.

A brand-new implementation (NOT a port) of the query/data-processing
capabilities of the reference pipeline ``bluecld/unified-ocr-pipeline``
(read-only at /root/reference), re-expressed Spark-first:

- ``kernels/``   pure-Python column kernels (zero Spark imports): content-type
                 sniffing, HTML boilerplate stripping, layout-aware PDF-style
                 parsing, document splitting, and the reference's exact field
                 extraction cascades (citations pinned per function).
- ``plans/``     Spark assembly: session config (AQE, partitions), the
                 Arrow-batched ``mapInPandas`` extraction stage, salted
                 bucketing for skewed hosts, checkpointed partition manifests
                 (resume), and per-partition lineage metrics.
- ``sources/``   deterministic seeded ``pages`` fixture generator + readers.
- ``operators/`` large-scale training-data ops: dedup (exact / MinHash-LSH /
                 SimHash / n-gram Jaccard / embedding cosine), similarity
                 search (brute-force + LSH-bucketed ANN), multimodal plumbing.
- ``functions/`` text analysis as JVM-side Column expressions: language-ID
                 heuristic, quality scoring, token counting, fingerprinting.
- ``streaming/`` incremental ingest (Trigger.AvailableNow / foreachBatch).
- ``oracle/``    single-threaded sequential oracle producing byte-identity
                 goldens for pytest.
"""

__version__ = "0.1.0"
