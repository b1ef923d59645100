"""road_networks post-processor (ref:postprocess/networks.go:15-525):
merge, extract, choose-most-important, shield-text regex chain. Includes
the ported shield-text integration golden
(ref:integration_tests/shield_text_test.go)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from osmzen_spark.pipeline.postprocess import road_networks

TRIPLE = T.ArrayType(
    T.StructType(
        [
            T.StructField("route", T.StringType()),
            T.StructField("network", T.StringType()),
            T.StructField("ref", T.StringType()),
        ]
    )
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("network", T.StringType()),
        T.StructField("ref", T.StringType()),
        T.StructField("operator", T.StringType()),
        T.StructField("mz_networks", TRIPLE),
    ]
)


def run(spark, rows):
    df = spark.createDataFrame(
        [dict(zip(("id", "network", "ref", "operator", "mz_networks"), r)) for r in rows],
        schema=SCHEMA,
    )
    out = road_networks({"roads": df}, 20, {"layer": "roads"})["roads"]
    return {r["id"]: r.asDict() for r in out.collect()}


def t(route, network, ref):
    return {"route": route, "network": network, "ref": ref}


def test_shield_text_golden(spark):
    """ref:integration_tests/shield_text_test.go — way in US:OH '3' and
    three US:US routes; most important is US:US with lowest ref -> '6'."""
    rows = run(
        spark,
        [
            (
                1,
                None,
                "US 6;US 20;US 42;SR 3",
                None,
                [
                    t("road", "US:OH", "3"),
                    t("road", "US:US", "6"),
                    t("road", "US:US", "20"),
                    t("road", "US:US", "42"),
                ],
            )
        ],
    )
    r = rows[1]
    assert r["shield_text"] == "6"
    assert r["network"] == "US:US"
    assert r["all_networks"] == ["US:US", "US:US", "US:US", "US:OH"]
    assert r["all_shield_texts"] == ["6", "20", "42", "3"]
    # own ref not merged (no network tag), so the property survives
    assert r["ref"] == "US 6;US 20;US 42;SR 3"
    assert "mz_networks" not in r


def test_merge_own_tags_and_country_fixup(spark):
    rows = run(
        spark,
        [
            # own network+ref -> moved into triples; US:I beats deeper nets
            (1, "US:I", "95", None, [t("road", "us:ny", "9")]),
            # ';' expansion: last segment in place (fixed network), others
            # appended with the ORIGINAL unfixed network (Go quirk)
            (2, None, None, None, [t("road", "us:i", "1;2")]),
            # operator backfill -> network BR
            (3, None, "116", "DNIT", []),
            # no network anywhere -> props pass through
            (4, None, "X1", None, []),
        ],
    )
    assert rows[1]["network"] == "US:I" and rows[1]["shield_text"] == "95"
    assert rows[1]["ref"] is None  # consumed by the merge
    # us:ny cc-fixed to US:ny (suffix case kept — ref:networks.go:172),
    # importance 5*10000+9 > US:I 10095
    assert rows[1]["all_networks"] == ["US:I", "US:ny"]
    # fixup keeps suffix case ("us:i" -> "US:i" != "US:I"), so both
    # triples land at depth importance 5; lower ref wins: the appended
    # (unfixed) segment with ref 1
    assert rows[2]["network"] == "us:i" and rows[2]["shield_text"] == "1"
    assert rows[2]["all_networks"] == ["us:i", "US:i"]
    assert rows[2]["all_shield_texts"] == ["1", "2"]
    assert rows[3]["network"] == "BR" and rows[3]["shield_text"] == "116"
    assert rows[4]["network"] is None and rows[4]["shield_text"] is None
    assert rows[4]["ref"] == "X1"


def test_shield_text_regex_chain(spark):
    rows = run(
        spark,
        [
            (1, "ua:territorial", "T-12-14", None, []),  # own tag: ua: unfixed
            (2, "GR:national", "A8", None, []),
            (3, "FR:A", "A 7", None, []),   # letter + space + number
            (4, "DE:BAB", "ABC-123", None, []),  # letters then number
            (5, "US:PA:Belt", "Red Belt", None, []),
            (6, "IT:A", "FI-PI-LI", None, []),
            (7, "SE", "E4;E20", None, []),  # own-tag refs are NOT expanded
        ],
    )
    assert rows[1]["shield_text"] == "T1214"
    assert rows[2]["shield_text"] == "A8"
    assert rows[3]["shield_text"] == "A7"
    assert rows[4]["shield_text"] == "123"
    assert rows[5]["shield_text"] == "Red Belt"
    assert rows[6]["shield_text"] == "FI-PI-LI"
    # own (network, ref) appended verbatim; shield regex takes no ';' path
    assert rows[7]["shield_text"] == "E4"


def test_bicycle_walking_bus_groups(spark):
    rows = run(
        spark,
        [
            (
                1,
                None,
                None,
                None,
                [
                    t("bicycle", "lcn", "5"),
                    t("bicycle", "ncn", "7"),
                    t("hiking", "rwn", "2"),
                    t("foot", "nwn", "9"),
                    t("bus", "", "39F"),
                    t("bus", "", "12"),
                    t("trolleybus", "", "3"),
                ],
            )
        ],
    )
    r = rows[1]
    # bicycle: ncn (code 2) beats lcn (code 4)
    assert r["bicycle_network"] == "ncn" and r["bicycle_shield_text"] == "7"
    assert r["all_bicycle_networks"] == ["ncn", "lcn"]
    # walking: nwn (2) beats rwn (3)
    assert r["walking_network"] == "nwn" and r["walking_shield_text"] == "9"
    # bus: non-numeric ref '39F' parses to 0 -> most important (Go NOTE)
    assert r["bus_shield_text"] == "39F"
    assert r["all_bus_shield_texts"] == ["39F", "3", "12"]


def test_end_to_end_through_engine(spark):
    """Roads layer emits network/ref/mz_networks; the configured
    road_networks step resolves shield text through the full pipeline."""
    from osmzen_spark.geom.derive import geometry_from_rings
    from osmzen_spark.pipeline.normalize import NormalizeEngine
    from conftest import make_elements
    from tests_util_membership import rels_df  # type: ignore # noqa

    geom = geometry_from_rings([[(0.0, 0.0), (0.01, 0.0)]], "LineString")
    elements = make_elements(
        spark,
        [(1, "way", {"highway": "primary", "name": "X", "ref": "US 6;SR 3"}, "LineString", geom)],
    )
    rels = rels_df(
        spark,
        [
            (10, "way", 1, {"type": "route", "route": "road", "network": "US:OH", "ref": "3"}),
            (11, "way", 1, {"type": "route", "route": "road", "network": "US:US", "ref": "6"}),
        ],
    )
    engine = NormalizeEngine()
    layers = engine.process(elements, zoom=20, layer_names=["roads"], relation_members=rels)
    row = layers["roads"].collect()[0].asDict()
    assert row["shield_text"] == "6"
    assert row["network"] == "US:US"
