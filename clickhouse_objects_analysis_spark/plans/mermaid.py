"""Mermaid rendering of the lineage graph.

Behavioral parity with the reference renderer
(dependencies_to_mermaid.py:25-151) — same option surface
(direction/indent/dedupe_edges/include_isolated_nodes), same validation
errors, same output grammar:

    graph <DIR>
      classDef chTable ...
      classDef chView ...
      <node>:::chTable|chView ...
      <src> -.-> <dst> ...
      <isolated nodes, sorted>

Differences by design: node lines are emitted in sorted order (the
reference iterates a Python set — arbitrary order; sorted is deterministic
and diff-friendly). Rendering is a driver-side pure function: a diagram is
inherently small data, so the DataFrame variant collects first (SURVEY
§3.3).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Mapping

from pyspark.sql import DataFrame

_VALID_DIRECTIONS = frozenset({"LR", "TB", "RL", "BT"})

_CLASS_DEFS = (
    "classDef chTable fill:#ffdd00,stroke:#000000,stroke-width:2px,color:#000000",
    "classDef chView fill:#d6e4f8,stroke:#154360,stroke-width:2px,color:#154360",
)


class MermaidDependencyGraphError(ValueError):
    """Raised on malformed dependency payloads or bad options."""


@dataclass(frozen=True)
class MermaidOptions:
    direction: str = "LR"  # LR, TB, RL, BT
    indent: str = "  "
    dedupe_edges: bool = True
    include_isolated_nodes: bool = True


def _validated_deps(data: Mapping[str, Any]) -> dict[str, list[str]]:
    if "view_dependencies" not in data:
        raise MermaidDependencyGraphError(
            "Missing required key: 'view_dependencies'"
        )
    raw = data["view_dependencies"]
    if not isinstance(raw, dict):
        raise MermaidDependencyGraphError(
            "'view_dependencies' must be a dictionary"
        )
    out: dict[str, list[str]] = {}
    for view, deps in raw.items():
        if not isinstance(view, str):
            raise MermaidDependencyGraphError(
                "All keys in 'view_dependencies' must be strings"
            )
        if deps is None:
            out[view] = []
            continue
        if not isinstance(deps, list):
            raise MermaidDependencyGraphError(
                f"Dependencies for '{view}' must be a list (or null)"
            )
        if any(not isinstance(d, str) for d in deps):
            raise MermaidDependencyGraphError(
                f"Dependencies for '{view}' must be a list of strings"
            )
        out[view] = deps
    return out


def json_to_mermaid(
    data: Mapping[str, Any],
    tables: set[str] = frozenset(),
    *,
    options: MermaidOptions = MermaidOptions(),
) -> str:
    """Render a {'view_dependencies': {view: [dep, ...]}} payload.

    Node names are emitted verbatim (no quoting); edges use '-.->' drawn
    dep → view (data flows from dependency into the view).

    An optional 'write_dependencies' key ({view: [target, ...]}) renders
    MV TO write destinations as distinct '==>' edges drawn view → target
    (data flows OUT of the view) — the opt-in reference-visitor-parity
    surface (r10 verdict #5; the reference collects the TO target as a
    dependency, ch_view_dependencies.py:144-231). Absent key = output
    byte-identical to before."""
    view_deps = _validated_deps(data)
    write_deps: dict[str, list[str]] = {}
    if "write_dependencies" in data:
        write_deps = _validated_deps(
            {"view_dependencies": data["write_dependencies"]}
        )

    direction = options.direction.strip().upper()
    if direction not in _VALID_DIRECTIONS:
        raise MermaidDependencyGraphError(
            "options.direction must be one of LR, TB, RL, BT"
        )
    ind = options.indent

    nodes: set[str] = set()
    edges: list[tuple[str, str]] = []
    for view, deps in view_deps.items():
        nodes.add(view)
        for dep in deps:
            nodes.add(dep)
            edges.append((dep, view))
    wedges: list[tuple[str, str]] = []
    for view, tgts in write_deps.items():
        nodes.add(view)
        for tgt in tgts:
            nodes.add(tgt)
            wedges.append((view, tgt))

    if options.dedupe_edges:
        edges = list(dict.fromkeys(edges))  # first-occurrence order
        wedges = list(dict.fromkeys(wedges))

    out: list[str] = [f"graph {direction}"]
    out += [f"{ind}{cd}" for cd in _CLASS_DEFS]
    out.append("")
    out += [
        f"{ind}{n}:::{'chTable' if n in tables else 'chView'}"
        for n in sorted(nodes)
    ]
    out.append("")

    if edges or wedges:
        out += [f"{ind}{src} -.-> {dst}" for src, dst in edges]
        out += [f"{ind}{src} ==> {dst}" for src, dst in wedges]
        if options.include_isolated_nodes:
            connected = {n for e in edges for n in e}
            connected |= {n for e in wedges for n in e}
            out += [f"{ind}{n}" for n in sorted(nodes - connected)]
    elif options.include_isolated_nodes:
        out += [f"{ind}{n}" for n in sorted(nodes)]

    return "\n".join(out) + "\n"


def loads_json_to_mermaid(
    json_str: str, *, options: MermaidOptions = MermaidOptions()
) -> str:
    """JSON-string entry point (reference :70-86)."""
    try:
        data = json.loads(json_str)
    except json.JSONDecodeError as exc:
        raise MermaidDependencyGraphError(f"Invalid JSON: {exc}") from exc
    if not isinstance(data, dict):
        raise MermaidDependencyGraphError(
            "Top-level JSON must be an object/dictionary"
        )
    return json_to_mermaid(data, options=options)


def dataframes_to_mermaid(
    edges: DataFrame,
    tables: DataFrame,
    *,
    options: MermaidOptions = MermaidOptions(),
) -> str:
    """DataFrame-native entry: edges(view, dep) + tables(name) collected to
    the driver (terminal render step — the only collect in the pipeline),
    then rendered by the pure function above. An optional ``kind`` column
    ('reads' | 'writes-to', the include_write_edges extraction surface)
    routes 'writes-to' rows to the distinct ==> edge style."""
    deps: dict[str, list[str]] = {}
    writes: dict[str, list[str]] = {}
    has_kind = "kind" in edges.columns
    cols = ["view", "dep"] + (["kind"] if has_kind else [])
    for row in edges.select(*cols).collect():
        if has_kind and row["kind"] == "writes-to":
            writes.setdefault(row["view"], []).append(row["dep"])
        else:
            deps.setdefault(row["view"], []).append(row["dep"])
    table_names = {row["name"] for row in tables.select("name").collect()}
    payload: dict = {"view_dependencies": deps}
    if writes:
        payload["write_dependencies"] = writes
    return json_to_mermaid(payload, table_names, options=options)
