"""SparkSession factory tuned for the local harness but cluster-shaped.

The driver harness passes its own SparkSession into ``queries()`` /
``entry()``; this factory is for tests, bench.py and standalone jobs. All
settings are scale-minded defaults: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), UTC session time zone (parity with the
DuckDB oracle, whose timestamps are UTC-naive), Arrow transfer for the
pandas-interop paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "end_to_end_data_lakehouse_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or cpu_count()
    shuffle_partitions = shuffle_partitions or max(cpus, DEFAULT_SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # With AQE coalescing on, shuffles should START wide and shrink to
        # fit: initialPartitionNum is the pre-coalesce width, so big
        # shuffles (the 100x rehearsal's 60M-row joins) get real
        # parallelism while small ones coalesce back to a handful of
        # tasks. shuffle.partitions alone would pin BOTH cases to 32.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(256, 8 * cpus)),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE (r12, measured and rejected): preferSortMergeJoin=false
        # (guide §3.1/§9's shuffled-hash preference) measured as a no-op
        # here — at bench scale AQE runtime-replans every SMJ-bearing
        # join to BroadcastHashJoin regardless (executed-plan probes:
        # LPA 21 BHJ / 0 SMJ, ngram-jaccard 16 BHJ), and an A/B that
        # looked like a 0.65-0.96x win inverted symmetrically when the
        # within-pass run order was flipped — pure back-to-back warm-run
        # bias, a protocol trap now recorded in OPTIMIZATION_r12.md.
        # Kept at the Spark default; revisit only with a cluster-scale
        # measurement where build sides exceed the broadcast threshold.
        # testdata read confs (catalog.ensure_read_confs pins the same two
        # at read time for driver-provided vanilla sessions)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
