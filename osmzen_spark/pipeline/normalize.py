"""NormalizeEngine: the full osmzen normalization pipeline, Spark-first.

Lifecycle mirrors ref:process.go Process() (SURVEY.md §3) with Spark
stage boundaries:

  1. derive geometry columns once (Arrow-vectorized mapInArrow)
  2. per-layer first-match rule eval (codegen'd when-chains)
  3. per-feature transforms (narrow withColumn stages)
  4. SetConditionalNames (broadcast id-joins) + configured
     post-processors in config order
  5. tile/cell assignment of centroids (pure Column math)

The per-tile zoom is a compile-time parameter (the reference processes
one tile bound/zoom per call; we process the whole table for a target
zoom in one distributed pass — ProcessElement fixture semantics use
zoom=20, ref:process.go:28-69).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmzen_spark.compiler.loader import CompiledConfig, load_config
from osmzen_spark.geom.derive import with_geometry_stats
from osmzen_spark.pipeline.postprocess import POSTPROCESSORS, set_conditional_names
from osmzen_spark.pipeline.transforms import apply_transforms
from osmzen_spark.tiling.cells import with_tile


class NormalizeEngine:
    def __init__(self, config: CompiledConfig | None = None):
        self.config = config or load_config()

    def derive(self, elements: DataFrame) -> DataFrame:
        """Stage 1: geometry-derived columns (area/length/clon/clat)."""
        return with_geometry_stats(elements)

    def eval_layers(
        self, derived: DataFrame, zoom: int, layer_names: list[str] | None = None
    ) -> dict[str, DataFrame]:
        """Stages 2+3: rule eval + transforms per layer.

        The derived input is evaluated once per layer; an element can
        match in multiple layers (ref:README.md:229).
        """
        out: dict[str, DataFrame] = {}
        for name in layer_names or list(self.config.layers):
            layer = self.config.layers[name]
            df = layer.evaluate(derived, zoom)
            df = apply_transforms(df, layer.transforms, zoom)
            out[name] = df
        return out

    def postprocess(self, layers: dict[str, DataFrame], zoom: int) -> dict[str, DataFrame]:
        """Stage 4: cross-feature/cross-layer post-processors."""
        layers = set_conditional_names(layers, zoom)
        for step in self.config.postprocess:
            fn = POSTPROCESSORS.get(step.fn)
            if fn is None:
                raise ValueError(f"unknown post-processor: {step.fn}")
            layers = fn(layers, zoom, step.params)
        return layers

    def process(
        self,
        elements: DataFrame,
        zoom: int = 20,
        tile_zoom: int | None = None,
        layer_names: list[str] | None = None,
    ) -> dict[str, DataFrame]:
        """Full pipeline; returns {layer_name: DataFrame} with tile
        columns (tile_z/tile_x/tile_y/cell) appended."""
        derived = self.derive(elements)
        layers = self.eval_layers(derived, zoom, layer_names)
        layers = self.postprocess(layers, zoom)
        tz = tile_zoom if tile_zoom is not None else min(zoom, 16)
        return {name: with_tile(df, tz) for name, df in layers.items()}

    def process_unioned(self, elements: DataFrame, zoom: int = 20, **kw) -> DataFrame:
        """Union all layers into one DataFrame (zen_layer column marks
        the layer) for sink-style consumption."""
        layers = self.process(elements, zoom, **kw)
        dfs = list(layers.values())
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df, allowMissingColumns=True)
        return out
