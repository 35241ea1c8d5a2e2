"""SparkSession factory with scale-oriented defaults.

Single place that owns the session configuration so tests, bench and
the driver entrypoint agree on shuffle sizing, AQE and Arrow settings.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geodata_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Defaults follow the scale guidance: AQE on (runtime coalescing +
    skew-join splitting), Arrow on (every pandas UDF crosses the
    JVM/Python boundary in columnar batches), shuffle partitions sized
    to the core count rather than the 200 default.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N, local[*] → cpu count; cluster masters keep a
        # multiple of default parallelism.
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = cpus if inner == "*" else int(inner)
        else:
            shuffle_partitions = 2 * cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # Pre-size the heap: with many executor threads the default
        # tiny -Xms triggers a growth/GC storm on the first
        # allocation-heavy stage (observed 15x first-run outliers at
        # local[32]).
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS",
                "-Xms8g -XX:+UseG1GC -XX:+AlwaysPreTouch",
            ),
        )
        # 128 MiB split targets keep scan tasks balanced at 100 TB scale
        # and are harmless at test scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # InferFiltersFromGenerate puts `size(arr) > 0 AND isnotnull(arr)`
        # UNDER every explode/posexplode.  When the array is a computed
        # expression (the corpus generator's transform(sequence(...))
        # span builder — the engine's canonical input shape), the filter
        # RE-BUILDS the whole array per row: the most expensive
        # expression in the plan is evaluated twice (guide §4.4's
        # duplicated-evaluation class, plan-visible as the transform()
        # tree appearing in both Filter and Project).  Measured 1.9x on
        # the synth+explode path (4.4s → 2.3s at 2M docs, r8).  The
        # rule only ever prunes rows with empty/null arrays — a row
        # class the explode itself drops — so excluding it trades a
        # never-firing row filter for half the expression work.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
