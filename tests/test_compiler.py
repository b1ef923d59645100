"""Unit tests for the condition/expression compiler (SURVEY.md §2.B/2.C),
mirroring the reference's filter/ unit tests."""

import pytest

from pyspark.sql import functions as F

from osmzen_spark.compiler.conditions import compile_condition
from osmzen_spark.compiler.context import EvalContext
from osmzen_spark.compiler.expressions import compile_expression
from osmzen_spark.compiler.functions import to_float_meters_col


def eval_rows(spark, rows, col):
    """rows: list of dicts with tags/geom_type/area..."""
    df = spark.createDataFrame(
        [
            {
                "tags": r.get("tags", {}),
                "geom_type": r.get("geom_type", "Point"),
                "area": float(r.get("area", 0.0)),
                "length": float(r.get("length", 0.0)),
            }
            for r in rows
        ],
        "tags map<string,string>, geom_type string, area double, length double",
    )
    return [x[0] for x in df.select(col.alias("v")).collect()]


def ctx():
    return EvalContext(derived={"area": F.col("area"), "length": F.col("length")})


def test_tag_equality_missing_is_empty(spark):
    # Go map miss -> "" (ref:conditions.go:466-473)
    cond = compile_condition({"building": "yes"}, ctx())
    vals = eval_rows(spark, [{"tags": {"building": "yes"}}, {"tags": {}}, {"tags": {"building": "no"}}], cond)
    assert vals == [True, False, False]


def test_tag_presence(spark):
    cond = compile_condition({"building": True}, ctx())
    vals = eval_rows(spark, [{"tags": {"building": "anything"}}, {"tags": {}}], cond)
    assert vals == [True, False]
    cond_f = compile_condition({"building": False}, ctx())
    vals = eval_rows(spark, [{"tags": {"building": "x"}}, {"tags": {}}], cond_f)
    assert vals == [False, True]


def test_in_list_lowercases_values(spark):
    # list values lowercased at compile (ref:conditions.go:499)
    cond = compile_condition({"parking": ["Multi-Storey", "underground"]}, ctx())
    vals = eval_rows(spark, [{"tags": {"parking": "multi-storey"}}, {"tags": {"parking": "Multi-Storey"}}], cond)
    assert vals == [True, False]  # raw tag compared against lowered list


def test_all_any_not_none(spark):
    c = ctx()
    cond = compile_condition({"all": [{"a": "1"}, {"any": [{"b": "2"}, {"c": "3"}]}]}, c)
    vals = eval_rows(
        spark,
        [
            {"tags": {"a": "1", "b": "2"}},
            {"tags": {"a": "1", "c": "3"}},
            {"tags": {"a": "1"}},
            {"tags": {"b": "2"}},
        ],
        cond,
    )
    assert vals == [True, True, False, False]
    cond2 = compile_condition({"none": [{"a": "1"}, {"b": "2"}]}, c)
    vals2 = eval_rows(spark, [{"tags": {}}, {"tags": {"a": "1"}}, {"tags": {"b": "2"}}], cond2)
    assert vals2 == [True, False, False]


def test_geometry_types_expansion(spark):
    cond = compile_condition({"geom_type": "line"}, ctx())
    vals = eval_rows(
        spark,
        [{"geom_type": "LineString"}, {"geom_type": "MultiLineString"}, {"geom_type": "Point"}],
        cond,
    )
    assert vals == [True, True, False]


def test_way_area_range(spark):
    cond = compile_condition({"way_area": {"min": 100, "max": 200}}, ctx())
    vals = eval_rows(spark, [{"area": 150}, {"area": 99}, {"area": 201}, {"area": 100}], cond)
    assert vals == [True, False, False, True]


def test_case_first_match_and_null(spark):
    expr = compile_expression(
        {
            "case": [
                {"when": {"a": "1"}, "then": "first"},
                {"when": {"b": "2"}, "then": "second"},
            ]
        },
        ctx(),
    )
    vals = eval_rows(
        spark,
        [{"tags": {"a": "1", "b": "2"}}, {"tags": {"b": "2"}}, {"tags": {}}],
        expr,
    )
    assert vals == ["first", "second", None]


def test_lookup_ordered_thresholds(spark):
    # descending table, first >= wins (ref:filter/lookup_expr.go)
    expr = compile_expression(
        {"lookup": {"key": {"col": "area"}, "op": ">=", "table": [[14, 2000], [15, 350], [16, 100]], "default": 18}},
        ctx(),
    )
    vals = eval_rows(spark, [{"area": 5000}, {"area": 400}, {"area": 120}, {"area": 50}], expr)
    assert vals == [14, 15, 16, 18]


def test_clamp_min_max_sum(spark):
    expr = compile_expression({"clamp": {"min": 15, "max": 17, "value": {"sum": [{"col": "area"}, 2.5]}}}, ctx())
    vals = eval_rows(spark, [{"area": 10}, {"area": 20}, {"area": 13.6}], expr)
    assert vals == [15.0, 17.0, 16.1]


def test_cond_expr_true_or_null(spark):
    expr = compile_expression({"cond": {"a": "1"}}, ctx())
    vals = eval_rows(spark, [{"tags": {"a": "1"}}, {"tags": {}}], expr)
    assert vals == [True, None]


def test_col_empty_string_is_null(spark):
    expr = compile_expression({"col": "name"}, ctx())
    vals = eval_rows(spark, [{"tags": {"name": "x"}}, {"tags": {"name": ""}}, {"tags": {}}], expr)
    assert vals == ["x", None, None]


# ToFloat64Meters cases from ref:util/utils_test.go:36-78
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("12", 12.0),
        ("1.5", 1.5),
        (" 5 ", 5.0),
        ("1.5mi", 2414.016),
        ("10ft", 3.048),
        ("4km", 4000.0),
        ("2nmi", 3704.0),
        ("6'7\"", pytest.approx(2.0066)),
        ("5'", pytest.approx(1.524)),
        ("gibberish", None),
        ("", None),
        ("about 12 something", 12.0),
    ],
)
def test_to_float_meters(spark, raw, expected):
    df = spark.createDataFrame([{"s": raw}], "s string")
    val = df.select(to_float_meters_col(F.col("s")).alias("v")).collect()[0][0]
    if expected is None:
        assert val is None
    else:
        assert val == expected


def test_building_height_semantics(spark):
    # ref:filter/functions.go:606-634 + context floor(h+0.5)
    c = ctx()
    col = c.height()
    cases = [
        ({"height": "10"}, 10.0),
        ({"building:levels": "7"}, 23.0),
        ({"height": "garbage largenum"}, None),  # 1e10 -> floored huge
        ({}, 0.0),
        ({"building:levels": "junk"}, None),  # 1e10
    ]
    df = spark.createDataFrame(
        [{"tags": t, "geom_type": "Polygon", "area": 0.0, "length": 0.0} for t, _ in cases],
        "tags map<string,string>, geom_type string, area double, length double",
    )
    vals = [r[0] for r in df.select(col.alias("v")).collect()]
    assert vals[0] == 10.0
    assert vals[1] == 23.0
    assert vals[2] == 1.0e10  # unparseable height -> 1e10 ("could be huge")
    assert vals[3] == 0.0
    assert vals[4] == 1.0e10


def test_compile_error_diagnostics():
    """ref:filter/errors.go analog: a bad rule raises CompileError
    naming layer, rule index, section, and dumping the YAML fragment."""
    import pytest

    from osmzen_spark.compiler.arrow_layer import ArrowLayerPlan
    from osmzen_spark.compiler.errors import CompileError
    from osmzen_spark.compiler.layer import load_layer

    bad = """
layer: broken
geometry: [Point]
rules:
  - when: { compare: [{ col: x }, "wat", 3] }
    min_zoom: 13
    emit: { kind: x }
"""
    layer = load_layer(bad)
    with pytest.raises(CompileError) as ei:
        ArrowLayerPlan(layer)
    msg = str(ei.value)
    assert "layer 'broken'" in msg
    assert "rule #0" in msg
    assert "'when'" in msg
    assert "compare" in msg  # the YAML fragment dump
