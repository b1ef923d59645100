"""Multilayer-shape phase decomposition at a given core count:
setup (config+datagen plan) / derive ckpt / union eval ckpt /
postprocess plan build / postprocess exec+write / steady repeats.

Usage: python scripts/profile_ml_phases.py CPUS [replicate] [sf_dir]
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
    from pyspark.sql import functions as F

    from osmzen_spark.session import get_spark
    from osmzen_spark.compiler.arrow_multilayer import (
        evaluate_all_layers_arrow,
        split_layer_views,
    )
    from osmzen_spark.datagen import synthetic_elements, synthetic_network
    from osmzen_spark.pipeline.normalize import NormalizeEngine
    from osmzen_spark.pipeline.transforms import apply_transforms
    from osmzen_spark.tiling.cells import with_tile

    spark = get_spark(app_name=f"mlphase-{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
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

    t0 = time.time()
    use = dict(eng.config.layers)
    union = evaluate_all_layers_arrow(derived, use, 20)
    union = eng._stage_cut(union, "eval_union", eager=True)
    T["union_eval_ckpt"] = time.time() - t0

    t0 = time.time()
    views = split_layer_views(union, use, derived.columns)
    layers = {
        n: apply_transforms(views[n], eng.config.layers[n].transforms, 20) for n in use
    }
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
    out.write.format("noop").mode("overwrite").save()
    T["noop_warm"] = time.time() - t0
    t0 = time.time()
    n = out.count()
    T["count_warm"] = time.time() - t0
    print({k: round(v, 1) for k, v in T.items()}, "n=", n, "cpus=", CPUS, "rep=", REP, flush=True)


main()
