"""Named, oracle-checked query registry (the driver contract surface).

Every operator from SURVEY.md §2 claimed as implemented has one entry here:
a PySpark builder in ``QUERIES`` and (where SQL-expressible) a DuckDB oracle
string in ``ORACLE``. Column names are aliased identically on both sides —
the driver sorts columns by name before hashing values.
"""

from __future__ import annotations

from .registry import ORACLE, QUERIES

# Importing the modules populates the registry. ORDER IS THE DRIVER
# CONTRACT: round 1's CORRECTNESS file covered exactly the first 50
# registry entries (import order), leaving every llm/lineage/streaming/
# sources/mutations/types query without a driver-side row. The custom
# operators — the expensive-to-trust ones — therefore come FIRST, and
# windows (with the round-2 decimal-cumsum fix to prove) stays inside the
# first-50 window; the TPC-H-ish relational core that already earned green
# driver rows in round 1 sits last.
from . import llm  # noqa: E402,F401
from . import lineage_queries  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import sources_queries  # noqa: E402,F401
from . import mutations_queries  # noqa: E402,F401
from . import types_surface  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import extras  # noqa: E402,F401
from . import core  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import setops  # noqa: E402,F401
from . import functions_surface  # noqa: E402,F401
from . import llm_extras  # noqa: E402,F401
from . import llm_wave3  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE"]
