"""SparkSession factory with scale-appropriate defaults.

Local mode is a stand-in for a multi-executor cluster: shuffle partition
count tracks core count (not the 200 default), AQE is on so skewed joins
split at runtime, and Arrow is enabled for every pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gnarly_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. On a real
    cluster this module is bypassed entirely (spark-submit owns the
    session); everything here is safe under an externally-provided master.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # NOT the deprecated INT96 default: MICROS timestamps get parquet
        # footer min/max stats (manifest zone maps, row-group skipping)
        # and predicate pushdown; INT96 columns carry no stats at all
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Pin the JVM's default locale: Java toLowerCase/toUpperCase are
        # locale-CONDITIONAL (a tr_TR/az/lt JVM lowers ASCII 'I' to 'ı'),
        # which would silently break every lower()-based expression whose
        # DuckDB oracle twin uses locale-independent simple casing
        # (langid normalization, case-insensitive equality). en_US is the
        # root-casing behavior both DuckDB and Python str.lower() match
        # (modulo the two Unicode SpecialCasing entries langid pins
        # explicitly).
        .config(
            "spark.driver.extraJavaOptions",
            "-Duser.language=en -Duser.country=US",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-Duser.language=en -Duser.country=US",
        )
    )
    # only set master when not already running under spark-submit
    if "SPARK_CONNECT_MODE_ENABLED" not in os.environ and not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
