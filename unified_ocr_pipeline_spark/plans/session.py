"""SparkSession factory with the engine's standard configuration.

Scale posture (SURVEY.md §4): AQE on (runtime coalescing + skew-join
split), Arrow enabled for the pandas-UDF extraction stage, UTC session
timezone (DuckDB-oracle comparability), shuffle partitions sized to cores
for local mode (a 1000-executor cluster would size this to ~2-3× total
cores instead — the knob is exposed).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "unified_ocr_pipeline_spark",
    cores: Optional[int] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[Dict[str, str]] = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize the JVM<->Python crossing for the
        # extraction stage (one crossing per batch, not per page)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet input split sizing — at 100 TB this bounds task input so a
        # partition's documents fit executor memory (SURVEY.md §4 X9)
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # the vectorized reader's default 4096-row batch is sized for narrow
        # numeric columns; with ~10-25 KB binary payloads per row that is
        # ~100 MB of heap PER CONCURRENT TASK (measured: heap OOM at 32-way
        # parallelism). 512 rows × 25 KB ≈ 13 MB/task keeps N-way reads
        # bounded — the per-core read-buffer budget a real cluster would set.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        # zstd over snappy for crawl text: measured 36% smaller extracted
        # parquet (954 vs 1502 MB on the 240k corpus) at equal wall-clock
        # on this host — at 100 TB the write/replicate/scan bytes dominate,
        # and zstd is the standard choice for web-corpus storage
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
