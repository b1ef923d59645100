"""One-off profiling harness: times the flagship normalize+tile at a
given SF in each physical shape (branch / branch+checkpoint /
single-pass+persist) so bench.py can run the shape we'd deploy.

Usage: python scripts/profile_flagship.py [sf_dir] [shapes...]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SHAPES = sys.argv[2:] or ["branch", "branch_ckpt", "single_pass"]


def build(spark, shape):
    from osmzen_spark.datagen import synthetic_elements, synthetic_network
    from osmzen_spark.pipeline.normalize import NormalizeEngine

    elements = synthetic_elements(spark, SF_DIR)
    net_elements, rels, way_nodes = synthetic_network(spark, SF_DIR)
    elements = elements.unionByName(net_elements)
    engine = NormalizeEngine()
    kw = dict(zoom=20, tile_zoom=14, relation_members=rels, way_nodes=way_nodes)
    if shape == "branch":
        return engine.process_unioned(elements, cache=False, **kw)
    if shape == "branch_ckpt":
        return engine.process_unioned(elements, cache=True, **kw)
    if shape == "single_pass":
        return engine.process_unioned(elements, single_pass=True, cache=True, **kw)
    raise ValueError(shape)


def main():
    from osmzen_spark.session import get_spark

    spark = get_spark(app_name="profile", master="local[32]", shuffle_partitions=32)
    for shape in SHAPES:
        # warm (codegen/JIT) then timed
        t0 = time.time()
        out = build(spark, shape)
        n = out.count()
        warm = time.time() - t0
        t0 = time.time()
        out2 = build(spark, shape)
        n2 = out2.count()
        sec = time.time() - t0
        print(f"SHAPE {shape}: cold={warm:.1f}s warm={sec:.1f}s rows={n}/{n2} -> {n2/sec:,.0f} f/s", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
