"""Python UDTFs (Spark 4 ``@udtf`` API) — SQL-visible table functions.

The reference grammar reaches table functions from SQL
(TableExprFunctionContext); sample_frames covers the mapInPandas UDTF
*shape*, this module covers the registered-API form: after
``register_udtfs(spark)``, ``LATERAL split_sentences(text)`` works in
plain ``spark.sql`` for every user. The sentence rule is
lookbehind-free (``[^.!?]+[.!?]*`` runs identically under Java regex
and RE2) so the DuckDB oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx: long, sentence: string, n_words: long")
class SplitSentences:
    """One row per sentence: matches of ``[^.!?]+[.!?]*``, trimmed,
    empties dropped, indexed in document order."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        import re

        kept = [
            s.strip()
            for s in re.findall(r"[^.!?]+[.!?]*", text or "")
            if s.strip()
        ]
        for i, s in enumerate(kept):
            yield i, s, len(s.split())


def register_udtfs(spark) -> None:
    """Idempotent SQL registration."""
    spark.udtf.register("split_sentences", SplitSentences)
