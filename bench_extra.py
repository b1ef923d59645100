"""Sidecar benchmark for optimization work (bench.py is FROZEN).

Times individual declared queries standalone — fresh JVM, noop sink,
same scrub protocol as bench.py — and optionally dumps
.explain("formatted") to plans/r06/<query>_<tag>.txt.

Usage:
    python bench_extra.py <query> [more queries...] [--tag before]
        [--trials 3] [--explain] [--sf /root/testdata/sf0.1]

Prints one JSON line per query: {"query", "trials": [...], "min": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    args = [a for a in sys.argv[1:]]

    def opt(name, default=None):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    explain = "--explain" in args
    if explain:
        args.remove("--explain")
    tag = opt("--tag", "probe")
    trials = int(opt("--trials", "2"))
    sf_dir = opt("--sf", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    names = args
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from bench import _noop, _scrub
    from osmzen_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extra", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    qs = entrymod.queries()
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        samples = []
        for t in range(trials):
            _scrub(spark)
            spark.sparkContext.setJobDescription(f"{name} trial {t}")
            t0 = time.time()
            _noop(qs[name](spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
        if explain:
            df = qs[name](spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        print(json.dumps({"query": name, "trials": samples, "min": min(samples)}), flush=True)


if __name__ == "__main__":
    main()
