"""One-time porting tool: re-encode a reference layer's rule list
(ref:config/yaml/<layer>.yaml) into the engine's dialect
(filter->when, output->emit, anchors resolved), applying the same
compile-time pruning as the reference (non-osm tables and
meta.source=ne/shp rules skipped, ref:filter/filter.go:91-112).

Usage: python scripts/port_layer_rules.py <layer> [--dry-run]

Keeps the target file's header (layer/geometry/clip_factor/transform)
and replaces only `rules:`. The emitted rules are anchor-free (each
rule self-contained); the layer compiler hoists repeated expressions,
so the bloat has no plan cost.
"""

from __future__ import annotations

import sys

import yaml

REF = "/root/reference/config/yaml/{}.yaml"
DST = "osmzen_spark/config/layers/{}.yaml"


def mentions_ne_shp(node) -> bool:
    """Does the filter reference meta.source in (ne, shp)?"""
    if isinstance(node, dict):
        for k, v in node.items():
            if k == "meta.source" and (v in ("ne", "shp") or (isinstance(v, list) and set(v) & {"ne", "shp"})):
                return True
            if mentions_ne_shp(v):
                return True
    elif isinstance(node, list):
        return any(mentions_ne_shp(x) for x in node)
    return False


def convert(layer: str) -> tuple[list[dict], int]:
    with open(REF.format(layer)) as f:
        doc = yaml.safe_load(f)
    rules = []
    skipped = 0
    for r in doc["filters"]:
        table = r.get("table")
        if table is not None and table != "osm":
            skipped += 1
            continue
        if mentions_ne_shp(r.get("filter", {})):
            skipped += 1
            continue
        rules.append(
            {
                "when": r.get("filter", {}),
                "min_zoom": r.get("min_zoom"),
                "emit": r.get("output", {}),
            }
        )
    return rules, skipped


def main() -> int:
    layer = sys.argv[1]
    dry = "--dry-run" in sys.argv
    rules, skipped = convert(layer)
    print(f"{layer}: {len(rules)} osm rules ({skipped} non-osm skipped)")
    if dry:
        return 0

    dst = DST.format(layer)
    with open(dst) as f:
        current = yaml.safe_load(f)

    header = (
        f"# {layer} layer — osmzen_spark rule dialect. FULL osm-table rule\n"
        f"# list, machine re-encoded from the reference's semantics by\n"
        f"# scripts/port_layer_rules.py (ref:config/yaml/{layer}.yaml;\n"
        f"# ne/shp-table rules pruned at compile exactly like the\n"
        f"# reference, ref:filter/filter.go:91-112). Rule ORDER is the\n"
        f"# first-match semantics — do not reorder.\n"
    )
    out = {
        "layer": layer,
        "geometry": current.get("geometry"),
        "clip_factor": current.get("clip_factor", 1.0),
        "transform": current.get("transform", []),
        "rules": rules,
    }
    with open(dst, "w") as f:
        f.write(header)
        yaml.safe_dump(out, f, sort_keys=False, allow_unicode=True, width=100)
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
