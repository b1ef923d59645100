"""Hardware-ceiling probe for the scaling analysis: two trivially
parallel jobs — (a) CPU-bound (iterative float math on tiny rows, no
shuffle) and (b) memory-bound (wide array rows, sum + write) — at a
given core count. If (b) stops scaling between local[8] and local[32]
while (a) scales, the box's shared DRAM bandwidth, not the engine's
plan shape, is the ceiling for byte-heavy phases.

Usage: python scripts/bandwidth_probe.py CPUS
"""

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1])


def main():
    from pyspark.sql import functions as F

    from osmzen_spark.session import get_spark

    spark = get_spark(app_name=f"probe-{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    # (a) CPU-bound: opaque per-row hash chain, tiny rows, no shuffle
    df = spark.range(0, 32_000_000, 1, CPUS * 4)
    expr = F.col("id")
    for _ in range(64):
        expr = F.xxhash64(expr)
    cpu_job = df.select(F.sum(F.pmod(expr, F.lit(997))).alias("s"))
    cpu_job.collect()  # warm
    t0 = time.time()
    cpu_job.collect()
    cpu_sec = time.time() - t0

    # (b) memory-bound: materialize ~8 GB of 512-double array rows
    # (opaque values), then aggregate them — reads dominate
    arr = F.transform(
        F.sequence(F.lit(1), F.lit(512)),
        lambda i: (F.xxhash64(F.col("id") + i) % 1000000).cast("double"),
    )
    wide = spark.range(0, 2_000_000, 1, CPUS * 4).select(arr.alias("a")).localCheckpoint(eager=True)
    mem_job = wide.select(F.sum(F.aggregate("a", F.lit(0.0), lambda acc, v: acc + v)).alias("s"))
    mem_job.collect()  # warm
    t0 = time.time()
    mem_job.collect()
    mem_sec = time.time() - t0

    print({"cpus": CPUS, "cpu_bound_sec": round(cpu_sec, 2), "mem_bound_sec": round(mem_sec, 2)}, flush=True)


main()
