from osmzen_spark.compiler.context import EvalContext  # noqa: F401
from osmzen_spark.compiler.conditions import compile_condition  # noqa: F401
from osmzen_spark.compiler.expressions import compile_expression  # noqa: F401
from osmzen_spark.compiler.layer import CompiledLayer, load_layer  # noqa: F401
from osmzen_spark.compiler.loader import load_config  # noqa: F401
