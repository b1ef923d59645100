"""spark-submit entry point (north-rule packaging path):

    spark-submit --py-files dist/osmzen_spark.zip scripts/submit_flagship.py \
        [--sf-dir DIR] [--out DIR] [--zoom 20] [--tile-zoom 14]

Runs the full normalize+tile flagship over the synthetic elements of
--sf-dir and writes the unioned per-layer output as parquet partitioned
by (tile_z, tile_x) with a lineage manifest (kill-resume checkpoint,
lineage.py). With no --out, counts features and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    ap.add_argument("--zoom", type=int, default=20)
    ap.add_argument("--tile-zoom", type=int, default=14)
    args = ap.parse_args()

    # import AFTER spark-submit has set up --py-files on sys.path
    from pyspark.sql import SparkSession

    from osmzen_spark.datagen import synthetic_elements, synthetic_network
    from osmzen_spark.pipeline.normalize import NormalizeEngine

    spark = SparkSession.builder.appName("osmzen-flagship").getOrCreate()
    elements = synthetic_elements(spark, args.sf_dir)
    net, rels, way_nodes = synthetic_network(spark, args.sf_dir)
    engine = NormalizeEngine()
    out = engine.process_unioned(
        elements.unionByName(net),
        zoom=args.zoom,
        tile_zoom=args.tile_zoom,
        cache=True,
        relation_members=rels,
        way_nodes=way_nodes,
    )
    if args.out:
        from osmzen_spark.lineage import write_stage

        write_stage(out, args.out, stage="flagship")
        print(json.dumps({"status": "written", "out": args.out}))
    else:
        print(json.dumps({"status": "ok", "n_features": out.count()}))


if __name__ == "__main__":
    main()
