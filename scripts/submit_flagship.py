"""spark-submit entry point (north-rule packaging path):

    spark-submit --py-files dist/osmzen_spark.zip scripts/submit_flagship.py \
        [--sf-dir DIR] [--out DIR] [--zoom 20] [--tile-zoom 14] [--replicate 1]

Runs the full normalize+tile flagship over the synthetic elements of
--sf-dir and writes the unioned per-layer output as parquet partitioned
by (tile_z, tile_x) with a lineage manifest (kill-resume checkpoint,
lineage.py). With no --out, measures the pipeline wall, the warm
feature count, and a steady full-width write (min of two — the same
protocol as bench.py --scaling), and prints one JSON line — so running
this artifact under two --master cluster sizes yields the north rule's
N-vs-4N throughput pair from the literal spark-submit --py-files path.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    ap.add_argument("--zoom", type=int, default=20)
    ap.add_argument("--tile-zoom", type=int, default=14)
    ap.add_argument("--replicate", type=int, default=1)
    args = ap.parse_args()

    # import AFTER spark-submit has set up --py-files on sys.path
    from pyspark.sql import SparkSession

    from osmzen_spark.datagen import synthetic_elements, synthetic_network
    from osmzen_spark.pipeline.normalize import NormalizeEngine

    spark = SparkSession.builder.appName("osmzen-flagship").getOrCreate()
    # Engine-required session confs (mirrors osmzen_spark.session.get_spark),
    # applied only where the submitter didn't set them explicitly. The
    # critical one is constraintPropagation=false: Catalyst's constraint
    # inference is super-linear on the 556-rule when-chain projections and
    # OOMs/stalls the driver without it (see session.py). The rest keep
    # Arrow exchange, codegen on wide projections, and UTC semantics on
    # regardless of the submitting environment.
    submitted = spark.sparkContext.getConf()
    for k, v in (
        ("spark.sql.constraintPropagation.enabled", "false"),
        ("spark.sql.codegen.maxFields", "400"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.execution.arrow.maxRecordsPerBatch", "10000"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)),
    ):
        if not submitted.contains(k):
            spark.conf.set(k, v)
    t0 = time.time()
    elements = synthetic_elements(spark, args.sf_dir, replicate=args.replicate)
    net, rels, way_nodes = synthetic_network(spark, args.sf_dir, replicate=args.replicate)
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
        return

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    _noop(out)
    pipeline_sec = time.time() - t0
    n = out.count()  # warm
    # steady full-width write: min of two warm runs (one-off GC pauses
    # must not masquerade as throughput), same protocol as bench.py
    t0 = time.time()
    _noop(out)
    steady_write_sec = time.time() - t0
    t0 = time.time()
    _noop(out)
    steady_write_sec = min(steady_write_sec, time.time() - t0)
    print(
        json.dumps(
            {
                "status": "ok",
                "master": spark.sparkContext.master,
                "n_features": n,
                "pipeline_sec": round(pipeline_sec, 3),
                "steady_write_sec": round(steady_write_sec, 3),
                "pipeline_features_per_sec": round(n / pipeline_sec, 1),
                "steady_write_features_per_sec": round(n / steady_write_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
