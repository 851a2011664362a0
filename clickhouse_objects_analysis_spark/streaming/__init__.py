"""Structured Streaming slice: the LIVE VIEW / WATCH and materialized-view
`TO dest` surface of the reference grammar (watchStmt
ClickHouseParser.py:14249-14321, destinationClause :5572), expressed as
readStream → windowed aggregation / transform → writeStream."""
