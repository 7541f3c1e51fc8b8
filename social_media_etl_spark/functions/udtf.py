"""Python UDTF surface (Spark 4): table functions usable in SQL FROM /
LATERAL position.

UDF-family policy (SURVEY §2.6): scalar logic stays in built-in
expressions; set-returning logic that genuinely needs Python becomes a
UDTF — the engine then treats it as a relation (lateral-joinable,
column-pruned at the boundary). ``NgramsUDTF`` is deliberately also
expressible with built-ins (functions/text.py:word_shingles) so tests
can assert the UDTF against the expression path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

__all__ = ["NgramsUDTF", "register_udtfs"]


@udtf(returnType="pos int, ngram string")
class NgramsUDTF:
    """``ngrams(text, n)`` → one row per word n-gram (with position).

    SQL usage::

        SELECT d.doc_id, g.pos, g.ngram
        FROM documents d, LATERAL ngrams(d.text, 2) g
    """

    def eval(self, text: str, n: int):  # noqa: D102
        if not text or n <= 0:
            return
        toks = text.strip().lower().split()
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("ngrams", NgramsUDTF)
