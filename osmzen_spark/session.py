"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100TB design point, scaled down for local test:
AQE on (runtime re-plan + skew-join splitting), Arrow enabled for all
pandas/Arrow UDF exchange, shuffle partitions sized to the local core
count (on a real cluster this is set to ~2-3x total cores by the
submitter; AQE coalesces small partitions automatically).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "osmzen-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # deterministic timestamp semantics regardless of box TZ: NTZ
        # parquet values cast to instants at face value (the DuckDB
        # oracles compare epoch_us of naive timestamps)
        .config("spark.sql.session.timeZone", "UTC")
        # our rule-engine projections are wide (60+ emit columns); the
        # default maxFields=100 silently disables whole-stage codegen
        # for them (interpreted eval, ~2x slower end-to-end). Janino
        # failures still degrade gracefully (codegen.fallback=true).
        .config("spark.sql.codegen.maxFields", "400")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # broadcast threshold generous: rank tables / rule lookups are tiny
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # constraint propagation walks every filter/join predicate tree
        # per plan node; with 500-rule when-chains + membership joins it
        # turns optimization into minutes of single-threaded driver CPU
        # (observed: >30 min at sf0.01). The inferred IsNotNull/equality
        # constraints buy nothing here — every predicate is already
        # explicit — so turn it off engine-wide.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # every decorated DataFrame API call otherwise does TWO extra
        # py4j round trips (set_current_origin + clear) plus a Python
        # stack walk to record an error call-site. The engine's plan
        # builders make thousands of API calls per query (measured:
        # 7.8k round trips / 6.4s of socket wait building the 9-layer
        # plan at sf0.01), so this debugging nicety is a material part
        # of the driver fixed cost F. Error messages stay intact —
        # only the "user line number" enrichment is dropped.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # single-JVM local mode: the "driver" heap is also every
        # executor's heap, and Catalyst holds multi-layer plans during
        # optimization — size generously (the box has 128 GiB)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # the rule engine generates LOTS of wide whole-stage-codegen
        # classes; the JVM default 240 MB code cache fills over a long
        # session and JIT quietly degrades to interpreted execution
        # (the "JVM aging" that inflated late bench queries ~3x).
        # 512 MB + flushing is the standard Spark recommendation for
        # codegen-heavy workloads. Only takes effect at JVM launch —
        # harmless on an already-running session.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTIONS",
                "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
            ),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
