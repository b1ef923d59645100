# NOTE: intentionally no eager re-exports — pipeline.normalize imports
# compiler.loader, which imports pipeline.matcher; an eager import here
# would create a cycle. Import submodules directly:
#   from osmzen_spark.pipeline.normalize import NormalizeEngine
