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
    empties dropped, indexed in document order. Word counting uses the
    EXPLICIT ASCII whitespace class — Python's str.split() splits on
    Unicode whitespace (NBSP, \\x1c…) while the RE2 oracle's \\s is
    ASCII-only, so the portable contract is the shared 5-char class."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        import re  # re caches compiled patterns; no per-call compile cost

        kept = [
            s.strip(" \t\n\f\r")
            for s in re.findall(r"[^.!?]+[.!?]*", text or "")
            if s.strip(" \t\n\f\r")
        ]
        for i, s in enumerate(kept):
            yield i, s, len(
                [w for w in re.split(r"[ \t\n\f\r]+", s) if w]
            )


def register_udtfs(spark) -> None:
    """Idempotent SQL registration."""
    spark.udtf.register("split_sentences", SplitSentences)
