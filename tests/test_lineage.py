"""Checkpoint/lineage tests: write, validate, resume-without-recompute,
corruption detection."""

import os

from osmzen_spark.lineage import run_stage, validate_stage, write_stage


def _df(spark, n=100):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).alias("bucket_key"),
        (F.col("id") * 31).alias("cell"),
        F.concat(F.lit("v"), F.col("id")).alias("payload"),
    )


def test_write_validate_roundtrip(spark, tmp_path):
    path = str(tmp_path / "stage1")
    manifest = write_stage(_df(spark), path, "stage1", "bucket_key")
    assert manifest["n_rows"] == 100
    assert manifest["n_buckets"] == 7
    assert validate_stage(spark, path)


def test_resume_skips_recompute(spark, tmp_path):
    path = str(tmp_path / "stage2")
    calls = []

    def compute():
        calls.append(1)
        return _df(spark)

    out1 = run_stage(spark, path, "stage2", "bucket_key", compute)
    assert out1.count() == 100 and calls == [1]
    out2 = run_stage(spark, path, "stage2", "bucket_key", compute)
    assert out2.count() == 100 and calls == [1]  # resumed, not recomputed


def test_corruption_detected(spark, tmp_path):
    path = str(tmp_path / "stage3")
    write_stage(_df(spark), path, "stage3", "bucket_key")
    # simulate a partial write after kill: remove a data file
    data_dir = os.path.join(path, "data")
    parts = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    os.remove(os.path.join(data_dir, parts[0]))
    assert not validate_stage(spark, path)


def test_missing_manifest_invalid(spark, tmp_path):
    assert not validate_stage(spark, str(tmp_path / "nope"))
