"""User entry point: catalog → DDL fetch → lineage → Mermaid → file.

Reference parity (ch_view_dependencies.py):
- ``fetch_view_ddl`` (:326-344, A3) — point lookup with a fallback chain:
  the reference prefers ``system.tables.create_table_query`` and falls
  back to ``SHOW CREATE TABLE``. The Spark analogue prefers
  ``SHOW CREATE TABLE`` (the stored create text), falls back to
  reconstructing from ``DESCRIBE EXTENDED``'s ``View Text`` row, and for
  session-temporary views reads the session catalog's view metadata.
- ``main`` (:367-396, A18) + console script (pyproject.toml:30-31) — the
  ``ch-view-deps OUTPUT.mmd`` flow: fetch views/tables, extract per-view
  dependencies with the per-view error channel, render Mermaid with
  isolated nodes excluded, write the file (parents created).

Env config (the CH_HOST/CH_PORT/CH_DATABASE analogue — connection config
is the SparkSession here, so only the semantic knobs carry over):
- ``VIEW_DEPS_DATABASE``   — default database for qualifying bare names
  and for views whose namespace is empty (temp views). Default ``default``.
- ``VIEW_DEPS_INCLUDE_SYSTEM`` — include system/information_schema
  databases (``1``/``true``/``yes``). Default off, like the reference.
- ``VIEW_DEPS_DIRECTION``  — Mermaid direction (LR/TB/RL/BT), default LR.
- ``VIEW_DEPS_WRITE_EDGES`` — also emit MATERIALIZED VIEW ``TO``
  destinations as distinct ``==>`` write edges (``1``/``true``/``yes``;
  the reference-visitor-parity opt-in, r10 verdict #5). Default off.

Everything is metadata-scale: one DDL string per view, graph ops as
DataFrame joins; the single driver materialization is the terminal
Mermaid render.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path
from typing import Optional

from pyspark.sql import SparkSession

from .plans.lineage import (
    catalog_objects,
    fetch_tables,
    fetch_views,
    view_dependencies_with_method,
)
from .plans.mermaid import MermaidOptions, json_to_mermaid


def _show_create(spark: SparkSession, qualified: str) -> Optional[str]:
    try:
        return spark.sql(f"SHOW CREATE TABLE {qualified}").collect()[0][0]
    except Exception:  # noqa: BLE001 — fall through the chain
        return None


def _describe_view_text(spark: SparkSession, qualified: str) -> Optional[str]:
    try:
        rows = spark.sql(f"DESCRIBE EXTENDED {qualified}").collect()
    except Exception:  # noqa: BLE001
        return None
    for r in rows:
        if r["col_name"] == "View Text" and r["data_type"]:
            return str(r["data_type"])
    return None


def _temp_view_text(spark: SparkSession, name: str) -> Optional[str]:
    """Session-temporary views: the create text lives in the session
    catalog's TemporaryViewRelation metadata (SQL-created temp views keep
    their viewText; DataFrame-registered ones have none)."""
    try:
        raw = spark._jsparkSession.sessionState().catalog().getRawTempView(name)
        if raw.isDefined():
            text = raw.get().tableMeta().viewText()
            if text.isDefined():
                return text.get()
    except Exception:  # noqa: BLE001
        pass
    return None


def fetch_view_ddl(spark: SparkSession, database: str, name: str) -> str:
    """DDL of one view, with fallback (reference :326-344). Returns either
    a full CREATE statement or (fallback paths) a bare SELECT — both are
    accepted by parse_table_dependencies. Raises RuntimeError when no
    path yields text, matching the reference's contract."""
    if database:
        qualified = f"`{database}`.`{name}`"
        ddl = _show_create(spark, qualified) or _describe_view_text(
            spark, qualified
        )
    else:
        ddl = _temp_view_text(spark, name) or _describe_view_text(
            spark, f"`{name}`"
        )
    if not ddl:
        raise RuntimeError(f"Could not fetch DDL for {database}.{name}")
    return ddl


def views_to_payload(
    spark: SparkSession,
    views: list[tuple[str, str, str]],
    default_db: str = "default",
    include_write_edges: bool = False,
) -> dict:
    """(db, name, engine) rows → {'view_dependencies': {...}, 'errors':
    {...}} (reference _views_to_json :346-361): per-view DDL fetch + parse,
    failures isolated into the errors channel.

    ``include_write_edges=True`` adds a 'write_dependencies' key with
    each MATERIALIZED VIEW's TO destination (the reference visitor's
    edge set, kept distinguishable — r10 verdict #5)."""
    triples: list[tuple[str, str, str]] = []
    errors: dict[str, str] = {}
    for db, name, _engine in views:
        try:
            triples.append((db or default_db, name, fetch_view_ddl(spark, db, name)))
        except Exception as exc:  # noqa: BLE001 — keep going, record error
            errors[f"{db or default_db}.{name}"] = (
                f"{type(exc).__name__}: {exc}"
            )
    deps: dict[str, list[str]] = {
        f"{db or default_db}.{name}": [] for db, name, _ in views
    }
    payload: dict = {"view_dependencies": deps, "errors": errors}
    edges, parse_errors = view_dependencies_with_method(
        spark, triples, include_write_edges=include_write_edges
    )
    writes: dict[str, list[str]] = {}
    for row in edges.collect():
        if include_write_edges and row["kind"] == "writes-to":
            writes.setdefault(row["view"], []).append(row["dep"])
        else:
            deps.setdefault(row["view"], []).append(row["dep"])
    if writes:
        payload["write_dependencies"] = writes
    for row in parse_errors.collect():
        errors[row["view"]] = row["error"]
    return payload


def _truthy(val: str) -> bool:
    return val.lower() in ("1", "true", "yes")


def main(argv: Optional[list[str]] = None) -> None:
    """``spark-view-deps OUTPUT.mmd`` (reference main :367-396)."""
    parser = argparse.ArgumentParser(
        description=(
            "Generates a Mermaid .mmd diagram from the Spark catalog's "
            "view dependencies."
        )
    )
    parser.add_argument("output", help="Path to output .mmd file.")
    args = parser.parse_args(argv)

    default_db = os.getenv("VIEW_DEPS_DATABASE", "default")
    include_system = _truthy(os.getenv("VIEW_DEPS_INCLUDE_SYSTEM", "0"))
    direction = os.getenv("VIEW_DEPS_DIRECTION", "LR")
    write_edges = _truthy(os.getenv("VIEW_DEPS_WRITE_EDGES", "0"))

    spark = SparkSession.builder.getOrCreate()

    print("Fetching views and tables from the Spark catalog...")
    catalog = catalog_objects(spark)
    views = [
        (r["db_name"], r["obj_name"], r["engine"])
        for r in fetch_views(catalog, include_system=include_system).collect()
    ]
    tables = {
        f"{r['db_name'] or default_db}.{r['obj_name']}"
        for r in fetch_tables(catalog, include_system=include_system).collect()
    }

    payload = views_to_payload(
        spark, views, default_db=default_db,
        include_write_edges=write_edges,
    )

    print("Converting to Mermaid diagram...")
    mermaid_graph = json_to_mermaid(
        payload,
        tables,
        options=MermaidOptions(
            direction=direction, include_isolated_nodes=False
        ),
    )

    print(f"Writing Mermaid diagram to: {args.output}")
    out_path = Path(args.output)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(mermaid_graph, encoding="utf-8", newline="\n")


if __name__ == "__main__":
    main()
