"""View→table lineage extraction and graph construction.

Reference parity (ch_view_dependencies.py):
- fetch_views/fetch_tables (:293-324)  → catalog DataFrame + filters (A1/A2)
- parse_view_tables (:233-258)         → Spark's own SQL parser plan walk
                                         (exact, replaces the ANTLR visitor
                                         heuristics A5-A9), then the
                                         scope-aware tokenizer walk
                                         (plans/chparse.py) for non-Spark
                                         dialects, then a conservative
                                         regex scan as last resort
- _views_to_json (:346-361)            → view_dependencies(): edges + error
                                         DataFrames (per-view error channel)
- graph build/dedup/classify (dependencies_to_mermaid.py:100-149, A11-A14)
  → DataFrame joins
- plus transitive closure (the reference stops at depth 1; closure is the
  natural scale extension, SURVEY §7 M2)

Scale design: parsing is metadata-scale (one DDL string per view). The
exact path uses the JVM parser on the driver (requires the SparkSession);
the tokenizer/regex fallback ladder is pure functions shipped via
mapInPandas when the catalog is huge
(`extract_dependencies_distributed`). Graph ops are plain DataFrame
joins — they scale to millions of edges without GraphFrames.
"""

from __future__ import annotations

import re
from typing import Optional

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .chparse import (
    ch_to_spark_sql,
    mv_write_targets,
    token_table_dependencies,
)

#: Raw-text trigger for the silent-misparse guard in
#: parse_table_dependencies_tagged — see the comment there.
_ARRAY_JOIN_TEXT_RE = re.compile(r"\bARRAY\s+JOIN\b", re.IGNORECASE)

# --------------------------------------------------------------------------
# Catalog layer (A1-A3)
# --------------------------------------------------------------------------


def catalog_objects(spark: SparkSession) -> DataFrame:
    """DataFrame(db_name, obj_name, engine) over every object Spark's
    catalog knows — the `system.tables` analogue. `engine` is Spark's
    tableType (MANAGED/EXTERNAL/VIEW/TEMPORARY), which plays the role of
    ClickHouse's engine column for view-vs-table classification."""
    rows = [
        (t.namespace[0] if t.namespace else "", t.name, t.tableType)
        for db in spark.catalog.listDatabases()
        for t in spark.catalog.listTables(db.name)
    ]
    return spark.createDataFrame(rows, "db_name string, obj_name string, engine string")


def fetch_views(catalog: DataFrame, include_system: bool = False) -> DataFrame:
    """Engine-contains-'View' filter + sort (reference :293-308). Spark's
    catalog reports temp views as tableType TEMPORARY — the only TEMPORARY
    objects Spark has are views, so they count as views here."""
    out = catalog.filter(
        F.upper("engine").contains("VIEW") | (F.upper("engine") == "TEMPORARY")
    )
    if not include_system:
        # lower() so INFORMATION_SCHEMA (case-preserving catalogs) is
        # excluded too — matches the reference's case coverage.
        out = out.filter(~F.lower("db_name").isin("system", "information_schema"))
    return out.orderBy("db_name", "obj_name")


def fetch_tables(catalog: DataFrame, include_system: bool = False) -> DataFrame:
    """Complement filter (reference :310-324)."""
    out = catalog.filter(
        ~(F.upper("engine").contains("VIEW") | (F.upper("engine") == "TEMPORARY"))
    )
    if not include_system:
        out = out.filter(~F.lower("db_name").isin("system", "information_schema"))
    return out.orderBy("db_name", "obj_name")


# --------------------------------------------------------------------------
# Identifier helpers (A9)
# --------------------------------------------------------------------------

_QUOTE_PAIRS = [("`", "`"), ('"', '"'), ("[", "]")]


def clean_identifier(ident: str) -> str:
    """Strip one level of back-tick / double-quote / bracket quoting and
    collapse doubled escape characters."""
    s = ident.strip()
    for lo, hi in _QUOTE_PAIRS:
        if len(s) >= 2 and s.startswith(lo) and s.endswith(hi):
            inner = s[1:-1]
            return inner.replace(lo * 2, lo)
    return s


def qualify(name: str, default_db: str) -> str:
    """Qualify an unqualified table name with the default database."""
    return name if "." in name else f"{default_db}.{name}"


# --------------------------------------------------------------------------
# Dependency extraction — exact path: Spark's own parser (§3.2)
# --------------------------------------------------------------------------


def _split_multipart(ident: str) -> list[str]:
    """Parse the `[db, table]` mkString form plan JSON uses for
    multipartIdentifier. (An identifier containing a literal ', ' would
    mis-split — acceptable for a lineage tool; the reference's regex
    heuristics have the same blind spot.)"""
    inner = ident.strip()
    if inner.startswith("[") and inner.endswith("]"):
        inner = inner[1:-1]
    return [p for p in inner.split(", ") if p]


def _scan_plan_json(obj, relations: list[list[str]], cte_names: set[str]) -> None:
    """Recursively collect UnresolvedRelation identifiers and CTE names
    from a logical plan's JSON rendering. One `plan.toJSON()` call
    serializes the ENTIRE tree (CTE bodies, expression-level subqueries
    included), so extraction is a pure-Python scan — the previous
    node-by-node Py4J traversal paid hundreds of JVM round trips per DDL
    (~1 s each; this is ~10 ms).

    INSERT targets are write edges, not read edges (same stance as the
    regex fallback and the reference), so the ``table`` field of an
    InsertIntoStatement is skipped — its ``query`` subtree still scans,
    keeping `INSERT INTO t SELECT … FROM src` → [src]."""
    if isinstance(obj, dict):
        cls = obj.get("class", "")
        if isinstance(cls, str) and cls.endswith(".UnresolvedRelation"):
            ident = obj.get("multipartIdentifier", "")
            if isinstance(ident, str) and ident:
                relations.append(_split_multipart(ident))
        if isinstance(cls, str) and cls.rsplit(".", 1)[-1] in (
            "UnresolvedWith",
            "With",
        ):
            for cte in obj.get("cteRelations") or []:
                name = cte.get("_1") if isinstance(cte, dict) else None
                if isinstance(name, str):
                    cte_names.add(name)
        skip = (
            {"table"}
            if isinstance(cls, str)
            and cls.endswith(".InsertIntoStatement")
            else ()
        )
        for k, v in obj.items():
            if k not in skip:
                _scan_plan_json(v, relations, cte_names)
    elif isinstance(obj, list):
        for v in obj:
            _scan_plan_json(v, relations, cte_names)


def parse_table_dependencies(
    spark: SparkSession, sql_text: str, default_db: str = "default"
) -> list[str]:
    """Referenced catalog tables of a SQL statement (CREATE VIEW / SELECT),
    exact where Spark's parser accepts the dialect, conservative-regex
    otherwise.

    The parser path upgrades the reference's best-effort tree heuristics
    (ch_view_dependencies.py:106-123 describes them as such): CTE names
    never surface as dependencies (A7) and table-valued functions parse as
    UnresolvedTableValuedFunction, not relations (A8) — both exclusions
    fall out of the grammar instead of regexes.
    """
    return parse_table_dependencies_tagged(spark, sql_text, default_db)[0]


def fallback_table_dependencies(
    sql_text: str, default_db: str = "default"
) -> tuple[list[str], str]:
    """The no-parser extraction ladder (pure function — ships to
    executors): the scope-aware tokenizer walk (plans/chparse.py,
    fidelity 'token') first, the flat regex scan ('regex') only if
    tokenization itself fails (unbalanced quotes/parens)."""
    try:
        return (
            token_table_dependencies(sql_text, default_db=default_db),
            "token",
        )
    except Exception:
        return regex_table_dependencies(sql_text, default_db), "regex"


def parse_table_dependencies_tagged(
    spark: SparkSession, sql_text: str, default_db: str = "default"
) -> tuple[list[str], str]:
    """Like parse_table_dependencies, plus the fidelity marker of the
    path taken: 'exact' (Spark parser plan walk — including CH-only
    DDLs that parse exactly after the mechanical surface rewrite,
    chparse.ch_to_spark_sql), 'token' (scope-aware tokenizer walk) or
    'regex' (flat-scan last resort)."""
    import json as _json

    relations: list[list[str]] = []
    cte_names: set[str] = set()

    def _parse(text: str) -> None:
        plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(text)
        _scan_plan_json(_json.loads(plan.toJSON()), relations, cte_names)

    # SILENT-misparse guard (r13): `FROM t ARRAY JOIN arr AS e` is
    # VALID Spark syntax with the wrong meaning — `ARRAY` parses as
    # t's alias and `JOIN arr` as a relation, so the direct parse
    # succeeds and reports the exploded COLUMN as a phantom table dep.
    # Unlike PREWHERE/FINAL/SAMPLE (which fail the direct parse and
    # fall into the promotion step naturally), this one must be
    # rewritten BEFORE the first parse. The token-aware rewrite only
    # reports 'array_join' when the clause exists outside string
    # literals, so a literal containing the words stays on the
    # direct path.
    to_parse = sql_text
    if _ARRAY_JOIN_TEXT_RE.search(sql_text):
        try:
            rewritten, applied = ch_to_spark_sql(sql_text)
            if "array_join" in applied:
                to_parse = rewritten
        except Exception:
            pass  # unparseable text falls through the normal ladder

    try:
        _parse(to_parse)
    except Exception:
        # Promotion step (r8 verdict #6, extended r10 with dictionary
        # DDL): CH-only SURFACE syntax (PREWHERE, SETTINGS, ENGINE
        # clauses, MV heads, FINAL/SAMPLE, GLOBAL/ANY join modifiers,
        # CREATE DICTIONARY → view-over-source, …) is rewritten
        # mechanically and re-parsed EXACTLY. Statements whose dropped
        # spans would lose real table refs (ENGINE = Distributed/
        # Dictionary argument lists) refuse the rewrite and fall to the
        # token walk, which extracts those engine-argument deps; the
        # token walk is otherwise reached only when even the rewritten
        # DDL is unparseable (truly exotic constructs, e.g. remote()/
        # merge() table functions with dialect-only argument forms).
        try:
            rewritten, applied = ch_to_spark_sql(sql_text)
            if not applied:
                raise ValueError("no CH construct to rewrite")
            _parse(rewritten)
        except Exception:
            return fallback_table_dependencies(sql_text, default_db)

    out = set()
    for parts in relations:
        if len(parts) == 1 and parts[0] in cte_names:
            continue
        out.add(qualify(".".join(parts), default_db))
    # dictGet*('db.dict', …) reads are function arguments, not relations —
    # invisible to ANY relation-level parse, so both paths add them here.
    out |= _dictget_dependencies(sql_text, default_db)
    return sorted(out), "exact"


# --------------------------------------------------------------------------
# Dependency extraction — fallback path: conservative regex scan
# --------------------------------------------------------------------------

# Quoted identifiers may embed their quote char doubled (`odd``name`).
_IDENT = r"(?:`(?:[^`]|``)+`|\"(?:[^\"]|\"\")+\"|[A-Za-z_]\w*)"
_QUALIFIED = rf"{_IDENT}(?:\s*\.\s*{_IDENT})?"
_TABLE_REF_RE = re.compile(
    rf"\b(FROM|JOIN)\s+({_QUALIFIED})", re.IGNORECASE
)
#: Comma-separated FROM lists (`FROM a, b` — the implicit cross join CH
#: accepts): continuation targets after a FROM match, optionally skipping
#: one `[AS] alias` token.
_COMMA_CONT_RE = re.compile(
    rf"(?:\s+(?:AS\s+)?[A-Za-z_]\w*)?\s*,\s*({_QUALIFIED})", re.IGNORECASE
)
_CTE_DEF_RE = re.compile(rf"\b({_IDENT})\s+AS\s*\(", re.IGNORECASE)
#: `ARRAY JOIN arr` / `LEFT ARRAY JOIN arr` explode an array column — the
#: identifier after that JOIN is a column, never a relation.
_ARRAY_JOIN_BEFORE_RE = re.compile(r"ARRAY\s+$", re.IGNORECASE)
#: `WATCH db.lv [EVENTS] [LIMIT n]` subscribes to a live view — the
#: watched view is a read dependency (watchStmt, ClickHouseParser.py:14249).
_WATCH_RE = re.compile(rf"\bWATCH\s+({_QUALIFIED})", re.IGNORECASE)
#: `CREATE TABLE x AS y` (schema clone, optionally + ENGINE = Distributed)
#: depends on the cloned table; `AS SELECT` / `AS (` are CTAS, not clones.
_CREATE_CLONE_RE = re.compile(
    rf"\bCREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QUALIFIED}\s+AS\s+"
    rf"(?!SELECT\b|WITH\b)({_QUALIFIED})",
    re.IGNORECASE,
)
#: Dictionary DDL names its source table inside SOURCE(CLICKHOUSE(...))
#: as TABLE '<t>' [DB '<db>'] string literals (dictionarySource rules).
_DICT_SOURCE_RE = re.compile(
    r"\bSOURCE\s*\(\s*CLICKHOUSE\s*\(([^()]*)\)", re.IGNORECASE
)
_DICT_TABLE_RE = re.compile(r"\bTABLE\s+'([^']+)'", re.IGNORECASE)
_DICT_DB_RE = re.compile(r"\bDB\s+'([^']+)'", re.IGNORECASE)
#: dictGet / dictGetString / dictGetOrDefault / … read a dictionary whose
#: name rides in the first string-literal argument — a read dependency
#: invisible to any relation-level parse (Spark's included).
_DICTGET_RE = re.compile(r"\bdictGet\w*\s*\(\s*'([^']+)'", re.IGNORECASE)
#: One quoted-or-bare identifier atom (the building block of _QUALIFIED);
#: used to split `db.table` captures WITHOUT breaking dots inside quotes.
_IDENT_ATOM_RE = re.compile(_IDENT)


def _mask_literals(sql_text: str) -> str:
    """Blank out comment bodies and single-quoted string CONTENTS
    (length-preserving) so the relation scans below can't hallucinate a
    `FROM`/`JOIN` out of a comment or a string literal. Single-quoted
    strings honor both ClickHouse escapes ('' and \\'); double-quoted /
    backtick tokens are identifiers in ClickHouse, never strings, so
    they pass through untouched. A single left-to-right pass keeps the
    interactions right ('-- inside a string' is a string, not a
    comment)."""
    out = list(sql_text)
    i, n = 0, len(sql_text)
    while i < n:
        c = sql_text[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql_text[j] == "\\":
                    j += 2
                    continue
                if sql_text[j] == "'":
                    if sql_text[j + 1 : j + 2] == "'":
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        elif c == "-" and sql_text[i : i + 2] == "--":
            j = sql_text.find("\n", i)
            j = n if j == -1 else j
            for k in range(i, j):
                out[k] = " "
            i = j
        elif c == "/" and sql_text[i : i + 2] == "/*":
            j = sql_text.find("*/", i + 2)
            j = n if j == -1 else j + 2
            for k in range(i, j):
                out[k] = " "
            i = j
        else:
            i += 1
    return "".join(out)


def _dictget_dependencies(sql_text: str, default_db: str) -> set[str]:
    """Dictionary names read via dictGet*('db.dict', ...) — extracted from
    the ORIGINAL text (the name lives inside a string literal)."""
    return {
        qualify(m.group(1), default_db)
        for m in _DICTGET_RE.finditer(sql_text)
    }


def regex_table_dependencies(sql_text: str, default_db: str = "default") -> list[str]:
    """Conservative fallback for dialects Spark can't parse (the same
    stance as the reference's last-resort text scan, re-derived, with the
    reference's guards: ch_view_dependencies.py:132-229): FROM/JOIN
    targets — including comma-separated FROM lists — plus WATCH subjects,
    CREATE TABLE ... AS clones, and dictionary CLICKHOUSE(TABLE/DB)
    sources; table functions (identifier followed by '(') excluded, ARRAY
    JOIN operands excluded, WITH-clause aliases excluded, quoting stripped
    (doubled quote chars collapsed), names qualified, comments and string
    literals masked first (a `FROM` inside either is text, not a
    relation), dictGet*('db.dict', …) reads included. INSERT targets are
    deliberately NOT dependencies (write edge, not read edge)."""
    masked = _mask_literals(sql_text)
    ctes = {clean_identifier(m.group(1)) for m in _CTE_DEF_RE.finditer(masked)}

    found: set[str] = set()

    def add(raw: str, end: int) -> bool:
        """Record one captured reference; False if it was a function call
        (caller stops any comma chain there)."""
        if masked[end : end + 1] == "(":
            return False  # table-valued function, not a relation
        # split db.table on the dots BETWEEN identifier atoms only — a
        # dot inside a quoted identifier (`w.db`.`t`) is part of the name
        parts = [clean_identifier(p) for p in _IDENT_ATOM_RE.findall(raw)]
        name = ".".join(parts)
        if not (len(parts) == 1 and parts[0] in ctes):
            found.add(qualify(name, default_db))
        return True

    for m in _TABLE_REF_RE.finditer(masked):
        if _ARRAY_JOIN_BEFORE_RE.search(masked[: m.start()]):
            continue  # ARRAY JOIN explodes a column, not a relation
        if not add(m.group(2), m.end()):
            continue
        if m.group(1).upper() == "FROM":  # follow `FROM a, b, c` lists
            pos = m.end()
            while True:
                cm = _COMMA_CONT_RE.match(masked, pos)
                if cm is None or not add(cm.group(1), cm.end()):
                    break
                pos = cm.end()
    for m in _WATCH_RE.finditer(masked):
        add(m.group(1), m.end())
    for m in _CREATE_CLONE_RE.finditer(masked):
        add(m.group(1), m.end())
    found |= _dictget_dependencies(sql_text, default_db)
    for m in _DICT_SOURCE_RE.finditer(sql_text):
        inner = m.group(1)
        t = _DICT_TABLE_RE.search(inner)
        if t:
            db = _DICT_DB_RE.search(inner)
            name = f"{db.group(1)}.{t.group(1)}" if db else t.group(1)
            found.add(qualify(name, default_db))
    return sorted(found)


def extract_dependencies_distributed(
    views: DataFrame,
    default_db_col: str = "db_name",
    include_write_edges: bool = False,
) -> DataFrame:
    """Fallback-path extraction as a distributed mapInPandas over a
    (db_name, obj_name, ddl) DataFrame — for catalogs too large to loop
    on the driver. Returns (view, dep, method) edge rows; ``method`` is
    the per-view fidelity marker ('token' for the scope-aware tokenizer
    walk, 'regex' where even tokenization failed — executors have no SQL
    parser; the driver pool below tags 'exact' where Spark's parser
    accepted the DDL), so a mixed-path catalog run records which edges
    carry parse-grade confidence.

    ``include_write_edges=True`` (r10 verdict #5) adds a ``kind`` column
    ('reads' | 'writes-to') and emits the CREATE MATERIALIZED VIEW … TO
    destinations as 'writes-to' edges, restoring reference-visitor
    edge-SET parity (its ANTLR walk collects the TO target as a
    dependency; ch_view_dependencies.py:144-231). Default output schema
    is unchanged."""

    def extract(batches):
        for pdf in batches:
            rows = []
            for db, name, ddl in zip(pdf[default_db_col], pdf["obj_name"], pdf["ddl"]):
                view = f"{db}.{name}"
                try:
                    deps, method = fallback_table_dependencies(ddl or "", db)
                    if include_write_edges:
                        for dep in deps:
                            rows.append((view, dep, method, "reads"))
                        for tgt in mv_write_targets(ddl or "", db):
                            rows.append((view, tgt, method, "writes-to"))
                    else:
                        for dep in deps:
                            rows.append((view, dep, method))
                except Exception:
                    pass
            cols = ["view", "dep", "method"]
            if include_write_edges:
                cols.append("kind")
            yield pd.DataFrame(rows, columns=cols)

    schema = "view string, dep string, method string"
    if include_write_edges:
        schema += ", kind string"
    return views.mapInPandas(extract, schema=schema)


# --------------------------------------------------------------------------
# Per-view extraction with error channel (A4) + graph ops (A11-A14)
# --------------------------------------------------------------------------


#: Driver-pool width for the exact parse path. Each parse is one Py4J
#: call that releases the GIL while the JVM tokenizes (~2-10 ms), so a
#: small pool overlaps the round trips; Catalyst's parser is stateless
#: per call (a fresh ANTLR lexer/parser each time), making concurrent
#: parsePlan calls safe. Beyond ~8 threads the Py4J gateway socket
#: serializes anyway.
_PARSE_POOL_WORKERS = 8


def view_dependencies(
    spark: SparkSession,
    views: list[tuple[str, str, str]],
    max_workers: int = _PARSE_POOL_WORKERS,
    include_write_edges: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """For (db, name, ddl) triples: edges DataFrame(view, dep) + errors
    DataFrame(view, error). Failures are isolated per view (reference
    :356-358); extraction keeps going. Parses run on a bounded driver
    thread pool — exact-path extraction of a 1k-view catalog stays in
    seconds instead of paying sequential Py4J latency per view (route
    catalogs beyond ~10k views through extract_dependencies_distributed,
    which trades parse-grade fidelity for executor parallelism and marks
    each edge 'regex').

    ``include_write_edges=True`` adds the MV TO write destinations as
    extra (view, dep) rows — the reference visitor's edge set (see
    view_dependencies_with_method)."""
    edges_m, errors = view_dependencies_with_method(
        spark, views, max_workers, include_write_edges
    )
    return edges_m.select("view", "dep"), errors


def view_dependencies_with_method(
    spark: SparkSession,
    views: list[tuple[str, str, str]],
    max_workers: int = _PARSE_POOL_WORKERS,
    include_write_edges: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """view_dependencies plus the per-edge fidelity marker column
    ``method`` ('exact' | 'token' | 'regex') recording which path
    extracted it.

    ``include_write_edges=True`` (r10 verdict #5) appends a ``kind``
    column ('reads' | 'writes-to') and emits each CREATE MATERIALIZED
    VIEW's TO destination as a 'writes-to' edge — restoring parity with
    the reference visitor, which collects every tableIdentifier
    INCLUDING the TO target (ch_view_dependencies.py:144-231;
    DestinationClauseContext, ClickHouseParser.py:5572). The default
    (False) keeps the pinned read-only stance and the 3-column schema."""
    from concurrent.futures import ThreadPoolExecutor

    def one(item: tuple[str, str, str]):
        db, name, ddl = item
        view = f"{db}.{name}"
        try:
            deps, method = parse_table_dependencies_tagged(
                spark, ddl, default_db=db
            )
            writes: list[str] = []
            if include_write_edges:
                try:
                    writes = mv_write_targets(ddl, default_db=db)
                except Exception:
                    writes = []
            return view, deps, writes, method, None
        except Exception as exc:  # noqa: BLE001 — per-view error channel
            return view, [], [], "error", str(exc)

    edge_rows: list[tuple] = []
    error_rows: list[tuple[str, str]] = []
    with ThreadPoolExecutor(max_workers=max(1, max_workers)) as pool:
        for view, deps, writes, method, err in pool.map(one, views):
            if err is not None:
                error_rows.append((view, err))
            elif include_write_edges:
                edge_rows.extend(
                    (view, dep, method, "reads") for dep in deps
                )
                edge_rows.extend(
                    (view, tgt, method, "writes-to") for tgt in writes
                )
            else:
                edge_rows.extend((view, dep, method) for dep in deps)
    schema = "view string, dep string, method string"
    empty_row: tuple = ("", "", "")
    if include_write_edges:
        schema += ", kind string"
        empty_row = ("", "", "", "")
    edges = spark.createDataFrame(edge_rows or [empty_row], schema)
    if not edge_rows:
        edges = edges.limit(0)
    errors = spark.createDataFrame(
        error_rows or [("", "")], "view string, error string"
    )
    if not error_rows:
        errors = errors.limit(0)
    return edges, errors


def graph_nodes(edges: DataFrame, tables: DataFrame) -> DataFrame:
    """Node set (src ∪ dst) classified table/view by membership in the
    `tables` name list (left join + CASE — A13)."""
    nodes = (
        edges.select(F.col("dep").alias("name"))
        .union(edges.select(F.col("view").alias("name")))
        .distinct()
    )
    t = tables.select(F.col("name").alias("t_name")).distinct()
    return nodes.join(t, nodes.name == t.t_name, "left").select(
        "name",
        F.when(F.col("t_name").isNotNull(), F.lit("table"))
        .otherwise(F.lit("view"))
        .alias("kind"),
    )


def isolated_nodes(all_nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Nodes touching no edge (anti-join — A14)."""
    endpoints = (
        edges.select(F.col("dep").alias("name"))
        .union(edges.select(F.col("view").alias("name")))
        .distinct()
    )
    return all_nodes.join(endpoints, "name", "left_anti").orderBy("name")


def transitive_closure(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """All (ancestor_dep, view) pairs reachable through the dependency
    graph — semi-naive iteration to fixpoint (the reference stops at direct
    deps; SURVEY §7 M2 names closure as the scale-minded extension).

    Semi-naive: each round extends only the *new* pairs (the frontier) by
    one hop against the base edge relation, then anti-joins out pairs
    already known — the standard Datalog evaluation strategy. Per round
    that is one join + one anti-join over the frontier, not a distinct over
    the whole closure. The base relation is broadcast: lineage graphs are
    catalog metadata (O(#views) edges), always far under the broadcast
    threshold; the frontier side is the one that can grow. Frontiers are
    localCheckpoint'ed each round so the plan stays flat. Rounds needed =
    graph diameter (bounded by max_iterations)."""
    base = F.broadcast(edges.select("view", "dep").distinct().localCheckpoint())
    closure = base
    frontier = base
    for _ in range(max_iterations):
        step = (
            frontier.alias("a")
            .join(base.alias("b"), F.col("a.dep") == F.col("b.view"))
            .select(F.col("a.view").alias("view"), F.col("b.dep").alias("dep"))
            .distinct()
        )
        # Lazy checkpoint: the take(1) probe materializes it — one job per
        # round instead of two.
        frontier = step.join(
            closure, on=["view", "dep"], how="left_anti"
        ).localCheckpoint(eager=False)
        if not frontier.take(1):
            break
        closure = closure.union(frontier).localCheckpoint(eager=False)
    return closure
