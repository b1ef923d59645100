"""Output/value expression compiler: YAML expression tree -> Spark Column.

Registry semantics follow ref:filter/expressions.go:32-43 and
ref:filter/lookup_expr.go — see SURVEY.md §2.C. The reference's
NumExpression specialization is subsumed by Catalyst's static typing.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column
from pyspark.sql import functions as F

from osmzen_spark.compiler.context import EvalContext
from osmzen_spark.compiler.functions import call_function, try_double

_LOOKUP_OPS = {
    ">=": operator.ge,
    "<=": operator.le,
    ">": operator.gt,
    "<": operator.lt,
}


def compile_expression(node, ctx: EvalContext) -> Column:
    # literals (ref:expressions.go:649-691)
    if node is None:
        return F.lit(None)
    if isinstance(node, bool):
        return F.lit(node)
    if isinstance(node, (int, float)):
        return F.lit(node)
    if isinstance(node, str):
        if node == "":
            return F.lit(None)
        return F.lit(node)
    if isinstance(node, dict) and len(node) == 1:
        (op, val), = node.items()
        fn = _EXPRS.get(op)
        if fn is not None:
            return fn(val, ctx)
    raise ValueError(f"cannot compile expression: {node!r}")


def compile_num_expression(node, ctx: EvalContext) -> Column:
    """Numeric-context compile (the reference's NumExpression promotion,
    ref:expressions.go:23-26): tag lookups and string literals are
    parsed with try_cast; composite expressions are already numeric
    (the reference rejects non-numeric operands at compile time)."""
    if isinstance(node, str):
        return F.lit(float(node))
    if isinstance(node, dict) and "col" in node and len(node) == 1:
        key = str(node["col"])
        if not key.startswith("tags->"):
            # numeric-context pseudo-columns (EvalNum semantics: height
            # 0 stays 0, not nil -- ref:expressions.go:127-129)
            if key == "height":
                return ctx.height()
            if key == "zoom":
                return ctx.zoom_pseudo()
            if key in ("area", "way_area"):
                return ctx.area()
            if ctx.pseudo(key) is not None:
                return compile_expression(node, ctx)
        return try_double(_expr_col(node["col"], ctx))
    return compile_expression(node, ctx)


def _expr_col(val, ctx: EvalContext) -> Column:
    """Tag lookup with pseudo-column dispatch (ref:expressions.go:134-183)."""
    key = str(val)
    if key.startswith("tags->"):  # ref:filter/filter.go:138-140
        key = key[len("tags->"):]
        return ctx.tag(key)
    pseudo = ctx.pseudo(key)
    if pseudo is not None:
        return pseudo
    return ctx.tag(key)


def _expr_call(val, ctx: EvalContext) -> Column:
    func = val["func"]
    args = [compile_expression(a, ctx) for a in val.get("args", [])]
    return call_function(func, args, ctx)


def _expr_case(val, ctx: EvalContext) -> Column:
    """First matching when -> then; optional else; no match -> NULL
    (ref:expressions.go:226-389)."""
    from osmzen_spark.compiler.conditions import compile_condition

    out = None
    else_expr = None
    for entry in val:
        if "when" in entry:
            cond = compile_condition(entry["when"], ctx)
            then = compile_expression(entry.get("then"), ctx)
            out = F.when(cond, then) if out is None else out.when(cond, then)
        elif "else" in entry:
            else_expr = compile_expression(entry["else"], ctx)
        else:
            raise ValueError(f"case entry needs when/then or else: {entry!r}")
    if out is None:
        return else_expr if else_expr is not None else F.lit(None)
    return out.otherwise(else_expr) if else_expr is not None else out


def _expr_clamp(val, ctx: EvalContext) -> Column:
    lo = compile_num_expression(val["min"], ctx)
    hi = compile_num_expression(val["max"], ctx)
    v = compile_num_expression(val["value"], ctx)
    return F.greatest(lo, F.least(hi, v))


def _nary(fn):
    def inner(val, ctx):
        cols = [compile_num_expression(v, ctx) for v in val]
        return fn(cols)

    return inner


def _expr_cond(val, ctx: EvalContext) -> Column:
    """condition -> true or NULL, never false (ref:expressions.go:521-540)."""
    from osmzen_spark.compiler.conditions import compile_condition

    return F.when(compile_condition(val, ctx), F.lit(True))


def _expr_lookup(val, ctx: EvalContext) -> Column:
    """Ordered threshold table; first row where `key op val` wins
    (ref:filter/lookup_expr.go:5-250). Row order IS the semantics."""
    op = _LOOKUP_OPS.get(val.get("op"))
    if op is None:
        raise ValueError(f"unknown lookup op: {val.get('op')!r}")
    key = compile_num_expression(val["key"], ctx)
    out = None
    for then, threshold in val["table"]:
        cond = op(key, compile_num_expression(threshold, ctx))
        then_col = compile_expression(then, ctx)
        out = F.when(cond, then_col) if out is None else out.when(cond, then_col)
    default = compile_expression(val.get("default"), ctx)
    if out is None:
        return default
    return out.otherwise(default)


def _expr_min(cols):
    return functools.reduce(lambda a, b: F.least(a, b), cols)


def _expr_max(cols):
    return functools.reduce(lambda a, b: F.greatest(a, b), cols)


def _expr_sum(cols):
    return functools.reduce(operator.add, cols)


def _expr_mul(cols):
    return functools.reduce(operator.mul, cols)


_EXPRS = {
    "col": _expr_col,
    "call": _expr_call,
    "case": _expr_case,
    "clamp": _expr_clamp,
    "min": _nary(_expr_min),
    "max": _nary(_expr_max),
    "sum": _nary(_expr_sum),
    "mul": _nary(_expr_mul),
    "cond": _expr_cond,
    "lookup": _expr_lookup,
}
