"""add_collision_rank goldens ported from
ref:integration_tests/collision_rank_test.go, plus ranker-quirk units
(ref:ranker/ranker.go:96-116)."""

from pyspark.sql import functions as F

from osmzen_spark.geom.derive import geometry_from_rings
from osmzen_spark.pipeline.collision import CollisionRanker, add_collision_rank
from osmzen_spark.pipeline.normalize import NormalizeEngine

from conftest import make_elements

PT = geometry_from_rings([[(0.5, 0.5)]], "Point")


def process_nodes(spark, tags_list, layer_names=None):
    elements = make_elements(
        spark, [(i + 1, "node", t, "Point", PT) for i, t in enumerate(tags_list)]
    )
    engine = NormalizeEngine()
    return engine.process(elements, zoom=20, layer_names=layer_names)


def ranks_of(layers):
    out = {}
    for name, df in layers.items():
        if "collision_rank" not in df.columns:
            continue
        for r in df.select("id", "collision_rank").collect():
            out.setdefault(name, {})[r["id"]] = r["collision_rank"]
    return out


def test_collision_rank_goldens(spark):
    layers = process_nodes(
        spark,
        [
            {"natural": "beach", "name": "Stinson Beach"},
            {"name": "Berkeley", "population": "120000", "place": "city"},
            {"name": "Berkeley2", "population": "210000", "place": "city"},
            {"name": "exit", "entrance": "fire_exit"},
        ],
    )
    r = ranks_of(layers)
    assert r["pois"][1] == 534       # pois/beach
    assert r["places"][2] == 350     # locality, population_rank from 120k
    assert r["places"][3] == 347     # locality, population_rank from 210k
    assert r["buildings"][4] == 4303  # buildings/exit


def test_no_rank_without_name(spark):
    layers = process_nodes(spark, [{"entrance": "main"}])
    r = ranks_of(layers)
    # unnamed non-pois feature -> where-gate false -> NULL rank
    for per_layer in r.values():
        for v in per_layer.values():
            assert v is None


def test_ranker_kind_group_quirk(spark):
    """A kind with no group in the layer -> catch-all, even when
    kind-less matchers exist (ref:ranker/ranker.go:100-105)."""
    doc = {
        "catch_all": 99,
        "entries": [
            {"layer": "pois", "kind": "a", "rank": 5},
            {"layer": "pois", "kind": "", "rank": 7},
            {"layer": "pois", "kind": "b", "rank": 6, "when": {"flag": True}},
        ],
    }
    ranker = CollisionRanker(doc)
    df = spark.createDataFrame(
        [
            {"id": 1, "kind": "a", "name": "x", "flag": None},
            {"id": 2, "kind": "zzz", "name": "x", "flag": None},  # no group -> catch-all
            {"id": 3, "kind": "b", "name": "x", "flag": True},
            {"id": 4, "kind": "b", "name": "x", "flag": False},  # falls to kindless 7
            {"id": 5, "kind": None, "name": "x", "flag": None},  # "" group -> 7
        ]
    )
    out = add_collision_rank({"pois": df}, 20, {"ranker": ranker})["pois"]
    got = {r["id"]: r["collision_rank"] for r in out.collect()}
    assert got == {1: 5, 2: 99, 3: 6, 4: 7, 5: 7}
