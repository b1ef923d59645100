"""Rich compile diagnostics (ref:filter/errors.go:7-28): a failed rule
compile names the layer, the rule index, the section (when / min_zoom /
emit key) and dumps the offending YAML fragment — so a bad port or a
user config typo points straight at the source line, like the
reference's CompileError + YAML dump."""

from __future__ import annotations

import yaml


class CompileError(ValueError):
    def __init__(self, layer: str, rule_idx: int | None, section: str, node, cause: Exception):
        self.layer = layer
        self.rule_idx = rule_idx
        self.section = section
        self.node = node
        self.cause = cause
        try:
            frag = yaml.safe_dump(node, default_flow_style=False, sort_keys=False).rstrip()
        except Exception:
            frag = repr(node)
        where = f"layer {layer!r}"
        if rule_idx is not None:
            where += f", rule #{rule_idx}"
        super().__init__(
            f"compile error in {where}, section {section!r}: {cause}\n"
            f"--- offending fragment ---\n{frag}"
        )


def rule_compile(layer_name: str, rule_idx: int | None, section: str, node, fn):
    """Run fn(); re-raise any failure as a located CompileError."""
    try:
        return fn()
    except CompileError:
        raise
    except Exception as e:  # noqa: BLE001 — wrap with location info
        raise CompileError(layer_name, rule_idx, section, node, e) from e
