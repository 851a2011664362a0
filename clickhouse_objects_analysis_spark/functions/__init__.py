"""ClickHouse-function-name → PySpark translation surface."""

from .ch import CH_FUNCTIONS, ch_expr, translate_name

__all__ = ["CH_FUNCTIONS", "ch_expr", "translate_name"]
