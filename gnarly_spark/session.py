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

    Locale pin on externally-owned sessions: builder confs only take
    effect when THIS call launches the JVM, so a spark-submit-owned
    cluster must pass the pin itself::

        spark-submit \
          --driver-java-options "-Duser.language=en -Duser.country=US" \
          --conf spark.executor.extraJavaOptions="-Duser.language=en -Duser.country=US"

    A misconfigured tr_TR/az/lt cluster would silently diverge from every
    lower()-with-oracle-twin expression, so this factory fail-louds: it
    asserts the driver JVM's default locale and (on fresh sessions) probes
    lower('I') through an executor task — see _assert_locale_pinned.
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
    was_active = SparkSession.getActiveSession() is not None
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _assert_locale_pinned(spark, probe_executor=not was_active)
    return spark


_LOCALE_HINT = (
    "pass --driver-java-options \"-Duser.language=en -Duser.country=US\" and "
    "--conf spark.executor.extraJavaOptions=\"-Duser.language=en "
    "-Duser.country=US\" to spark-submit"
)


def _assert_locale_pinned(spark: SparkSession, probe_executor: bool) -> None:
    """Fail loud when the JVM locale pin is missing.

    Builder confs are ignored when the JVM was launched by spark-submit,
    so an externally-owned tr_TR/az/lt session would otherwise silently
    lose the pin and every lower()-with-DuckDB-oracle-twin expression
    (langid normalization, case-insensitive equality) would diverge.
    Driver side is a free py4j locale read; executor side is a one-row
    lower('I') probe (the tr/az-visible divergence: 'I' -> 'ı'), run only
    when this call actually created the session.
    """
    lang = spark.sparkContext._jvm.java.util.Locale.getDefault().getLanguage()
    if lang in ("tr", "az", "lt"):
        raise RuntimeError(
            f"driver JVM default locale '{lang}' breaks locale-conditional "
            f"lower()/upper() vs the DuckDB oracles; {_LOCALE_HINT}"
        )
    if probe_executor:
        from pyspark.sql import functions as F

        row = spark.range(1).select(F.lower(F.lit("I")).alias("l")).first()
        if row["l"] != "i":
            raise RuntimeError(
                f"executor JVM lowers 'I' to {row['l']!r} (locale-conditional "
                f"casing is unpinned on executors); {_LOCALE_HINT}"
            )
