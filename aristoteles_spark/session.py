"""SparkSession factory tuned for the test/bench environment.

local[N] single-JVM mode for tests; the same configs are what we would
set cluster-side at 100 TB (AQE on, shuffle partitions sized to cores,
Arrow enabled for the pandas-UDF slow path).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "aristoteles_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    Shuffle partitions match core count in local mode — 200 (the default)
    would create tiny tasks at test scale; on a real cluster this is set to
    2-3x total executor cores and AQE coalesces down at runtime.
    """
    n = cpus or DEFAULT_CPUS
    b = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python Data Source API (sources/wview_datasource.py): allow
        # pushFilters() to prune partitions/rows at planning time
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # codegen class cache sized for a many-query session: the default
        # 100 entries thrash under hundreds of distinct queries — every
        # pass recompiles every WholeStageCodegen unit through Janino
        # (measured: a 50-query slice of the suite ran 23% faster at
        # 10000, mirrored A/B sum-of-mins 39.5 -> 30.3 s). Generated
        # classes are a few KB each; real usage is a few thousand
        # entries, so the cap is headroom, not a memory commitment.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "10000"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # iterative operators localCheckpoint per round; the blocks are
        # freed by ContextCleaner only after a JVM GC, and with a large
        # heap GC may not run for the whole session — force one
        # periodically so dead checkpoint/persist blocks don't accumulate
        # and evict live caches. Must be longer than any latency-sensitive
        # run: a forced full GC + the ContextCleaner's blocking block
        # removals landing inside a query added ~50 s to it (measured);
        # bench disables it entirely and GCs between passes instead.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "15min"),
        )
    )
    # throwaway per-process warehouse: bucketed saveAsTable writes through
    # the (in-memory) catalog, and the default warehouse dir would land in
    # CWD — repo pollution and collisions between concurrent processes
    b = b.config(
        "spark.sql.warehouse.dir",
        tempfile.mkdtemp(prefix="aspark_meta_") + "/warehouse",
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
