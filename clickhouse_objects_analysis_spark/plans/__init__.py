"""The reference tool's own dataflow, rebuilt Spark-first (SURVEY §2.A,
§3): catalog scan → view-DDL dependency extraction → lineage graph →
Mermaid rendering."""
