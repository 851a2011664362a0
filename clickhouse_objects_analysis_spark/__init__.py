"""PySpark-native analytics engine with the query and data-processing
capabilities of dmserg/clickhouse_objects_analysis.

Layers (see SURVEY.md):

- ``session``    — SparkSession factory + testdata table registry.
- ``operators``  — relational operators Spark lacks natively (ASOF/ANY join,
                   LIMIT BY, WITH FILL, WITH TOTALS, dedup, similarity, text).
- ``functions``  — ClickHouse-function-name → PySpark translation surface.
- ``plans``      — the reference's own dataflow: catalog scan → view-DDL
                   dependency extraction → lineage graph → Mermaid render.
- ``streaming``  — Structured Streaming slice (LIVE VIEW / materialized-view
                   `TO dest` semantics).
- ``queries``    — named, oracle-checked query registry (driver contract).

Everything is DataFrame-first: plans are declared via the PySpark DataFrame /
SQL API and optimized by Catalyst; Python UDFs appear only where built-in
operators cannot express the semantics (none in the relational core).
"""

__version__ = "0.1.0"
