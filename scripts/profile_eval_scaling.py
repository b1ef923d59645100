"""Rule-eval scaling arm: times the Arrow-batch rule evaluation of all
9 layers (the engine's core compute — mapInArrow numpy kernels) over a
pre-materialized derived table, at a given core count. No checkpoint
writes in the timed segment, so this isolates executor compute.

Usage: python scripts/profile_eval_scaling.py CPUS [replicate] [sf_dir]
"""

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1])
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 2
SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"


def main():
    from osmzen_spark.session import get_spark
    from osmzen_spark.datagen import synthetic_elements, synthetic_network
    from osmzen_spark.pipeline.normalize import NormalizeEngine
    from osmzen_spark.pipeline.transforms import apply_transforms

    spark = get_spark(app_name=f"eval-{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    elements = synthetic_elements(spark, SF, replicate=REP)
    net, rels, wn = synthetic_network(spark, SF, replicate=REP)
    eng = NormalizeEngine()
    derived = eng.derive(elements.unionByName(net), rels, wn).localCheckpoint(eager=True)

    def run_all(verbose=False):
        for name in list(eng.config.layers):
            t0 = time.time()
            layer = eng.config.layers[name]
            df = apply_transforms(layer.evaluate(derived, 20), layer.transforms, 20)
            df.write.format("noop").mode("overwrite").save()
            if verbose:
                print(f"  layer {name}: {time.time()-t0:.1f}s", flush=True)

    run_all()  # warm: codegen + python workers
    t0 = time.time()
    run_all()
    sec1 = time.time() - t0
    t0 = time.time()
    run_all(verbose=True)
    sec2 = time.time() - t0
    n = derived.count()
    print(
        {
            "cpus": CPUS,
            "rep": REP,
            "rows_in": n,
            "eval_sec_r1": round(sec1, 1),
            "eval_sec_r2": round(sec2, 1),
        },
        flush=True,
    )


main()
