"""Phase-level wall breakdown of the flagship pipeline at a given SF:
config load, datagen plan, derive+membership checkpoint, multilayer
Arrow eval + union checkpoint, per-layer view/transform plan build,
postprocess plan build, final execute+write. Distinguishes driver-side
plan construction (py4j/Catalyst, data-size-independent) from executed
stages so the fixed-cost work targets the right phase.

Usage: python scripts/profile_pipeline_phases.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main():
    from pyspark.sql import functions as F

    from osmzen_spark.session import get_spark

    marks = [("t0", time.time())]

    def mark(name):
        marks.append((name, time.time()))

    spark = get_spark(app_name="profile-phases", master="local[32]", shuffle_partitions=32)
    mark("session")

    from osmzen_spark.datagen import synthetic_elements, synthetic_network
    from osmzen_spark.pipeline.normalize import NormalizeEngine

    engine = NormalizeEngine()
    mark("config_load_compile")

    elements = synthetic_elements(spark, SF_DIR)
    net_elements, rels, way_nodes = synthetic_network(spark, SF_DIR)
    elements = elements.unionByName(net_elements)
    mark("datagen_plan")

    derived = engine.derive(elements, rels, way_nodes)
    derived = engine._stage_cut(derived, "derived", eager=True)
    derived.count()
    mark("derive_membership_ckpt_exec")

    from osmzen_spark.compiler.arrow_multilayer import (
        evaluate_all_layers_arrow,
        split_layer_views,
    )

    names = list(engine.config.layers)
    use = {n: engine.config.layers[n] for n in names}
    union = evaluate_all_layers_arrow(derived, use, 20, names)
    mark("eval_plan_build")
    union = engine._stage_cut(union, "eval_union", eager=True)
    union.count()
    mark("eval_exec_ckpt")

    views = split_layer_views(union, use, derived.columns)
    from osmzen_spark.pipeline.transforms import apply_transforms

    layers = {n: apply_transforms(views[n], engine.config.layers[n].transforms, 20) for n in names}
    mark("views_transforms_plan")

    layers = engine.postprocess(layers, 20)
    mark("postprocess_plan_build")

    from osmzen_spark.tiling.cells import with_tile

    layers = {n: with_tile(df, 14) for n, df in layers.items()}
    dfs = list(layers.values())
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    mark("tile_union_plan")

    out.write.format("noop").mode("overwrite").save()
    mark("final_exec_write")

    n = out.count()
    mark("warm_count")

    prev = marks[0][1]
    total = marks[-1][1] - marks[0][1]
    for name, t in marks[1:]:
        print(f"{name:32s} {t - prev:8.2f} s")
        prev = t
    print(f"{'TOTAL':32s} {total:8.2f} s   rows={n}")
    engine.release()
    spark.stop()


if __name__ == "__main__":
    main()
