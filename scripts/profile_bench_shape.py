"""Replicates bench.py's exact measurement protocol (build once, warm
_noop, then time a count() on the same DataFrame) for a given flagship
shape, with stage-level timing.

Usage: python scripts/profile_bench_shape.py [sf_dir] [cache|nocache|single] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
SHAPE = sys.argv[2] if len(sys.argv) > 2 else "cache"
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32


def main():
    from osmzen_spark.session import get_spark
    from osmzen_spark.datagen import synthetic_elements, synthetic_network
    from osmzen_spark.pipeline.normalize import NormalizeEngine

    spark = get_spark(app_name="profile-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    t0 = time.time()
    elements = synthetic_elements(spark, SF_DIR)
    net_elements, rels, way_nodes = synthetic_network(spark, SF_DIR)
    elements = elements.unionByName(net_elements)
    engine = NormalizeEngine()
    kw = dict(zoom=20, tile_zoom=14, relation_members=rels, way_nodes=way_nodes)
    if SHAPE == "cache":
        out = engine.process_unioned(elements, cache=True, **kw)
    elif SHAPE == "nocache":
        out = engine.process_unioned(elements, cache=False, **kw)
    else:
        out = engine.process_unioned(elements, single_pass=True, cache=True, **kw)
    print(f"build plan: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    print(f"first action (cold exec + checkpoint materialize): {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    n = out.count()
    print(f"timed count (bench's number): {time.time()-t0:.1f}s rows={n} -> {n/(time.time()-t0):,.0f} f/s", flush=True)


if __name__ == "__main__":
    main()
