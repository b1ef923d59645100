from osmzen_spark.pipeline.normalize import NormalizeEngine  # noqa: F401
