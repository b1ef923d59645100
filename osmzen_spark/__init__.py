"""osmzen_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-creates the query/data-processing capabilities of paulmach/osmzen
(Tilezen's OSM -> vector-tile normalization) as an idiomatic Spark engine:

* a YAML rule compiler that turns osmzen-style condition / min_zoom /
  output trees into Spark ``Column`` expressions (whole-stage codegen,
  never per-row Python)  -- see :mod:`osmzen_spark.compiler`
* Arrow-vectorized geometry kernels (Web-Mercator area / length /
  centroid over flat coordinate buffers)  -- :mod:`osmzen_spark.geom`
* a z/x/y + Morton-cell tiling core (cell encoding, cell rings,
  point-in-polygon, kNN, raster<->vector joins)  -- :mod:`osmzen_spark.tiling`
* layer pipelines + cross-layer post-processing (rank matchers,
  backfill joins, conditional names, quantize/clamp)  -- :mod:`osmzen_spark.pipeline`
* large-scale training-data ops (dedup, similarity search, text stats)
  -- :mod:`osmzen_spark.ops`

The reference implementation (read-only, for behavior only) lives at
/root/reference; citations in docstrings use ``ref:file:line`` form.
"""

__version__ = "0.1.0"

from osmzen_spark.session import get_spark  # noqa: F401
