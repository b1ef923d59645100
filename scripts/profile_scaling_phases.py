"""Phase-wise scaling diagnosis: times each pipeline phase at a given
core count (same input) so the non-scaling phase is identifiable.

Usage: python scripts/profile_scaling_phases.py CPUS [replicate] [sf_dir]
"""

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1])
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"


def main():
    from osmzen_spark.session import get_spark
    from osmzen_spark.datagen import synthetic_elements, synthetic_network
    from osmzen_spark.pipeline.normalize import NormalizeEngine
    from osmzen_spark.pipeline.transforms import apply_transforms
    from osmzen_spark.tiling.cells import with_tile

    spark = get_spark(app_name=f"phases-{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    T = {}
    t0 = time.time()
    elements = synthetic_elements(spark, SF, replicate=REP)
    net, rels, wn = synthetic_network(spark, SF, replicate=REP)
    elements = elements.unionByName(net)
    eng = NormalizeEngine()
    T["setup"] = time.time() - t0

    t0 = time.time()
    derived = eng._stage_cut(eng.derive(elements, rels, wn), "derived", eager=True)
    T["derive_ckpt"] = time.time() - t0

    layers = {}
    t_compile = 0.0
    t_exec = 0.0
    for name in list(eng.config.layers):
        t0 = time.time()
        layer = eng.config.layers[name]
        df = apply_transforms(layer.evaluate(derived, 20), layer.transforms, 20)
        t_compile += time.time() - t0
        t0 = time.time()
        layers[name] = eng._stage_cut(df, name, eager=True)
        t_exec += time.time() - t0
    T["layers_compile"] = t_compile
    T["layers_exec"] = t_exec

    t0 = time.time()
    post = eng.postprocess(layers, 20)
    T["post_build"] = time.time() - t0

    t0 = time.time()
    dfs = [with_tile(d, 14) for d in post.values()]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    out.write.format("noop").mode("overwrite").save()
    T["post_exec_noop"] = time.time() - t0

    t0 = time.time()
    n = out.count()
    T["count_warm1"] = time.time() - t0
    t0 = time.time()
    out.count()
    T["count_warm2"] = time.time() - t0
    print({k: round(v, 1) for k, v in T.items()}, "n=", n, "cpus=", CPUS, "rep=", REP, flush=True)


main()
