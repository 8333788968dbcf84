"""Python UDTFs — the table-function surface (SURVEY §2.7).

The reference has no UDTF concept (closest: UNNEST + connector system
tables); Spark 3.4+/4.x adds @udtf Python table functions.  One worked
example ships so the capability is wired and tested: a text n-gram
exploder usable from SQL after register_udtfs(spark).

UDTFs are Python-side (slow path) — for anything expressible with
explode/transform use the native registry instead; this exists for
logic that genuinely needs imperative row generation.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="ngram: string, start_pos: int")
class NgramUDTF:
    """ngrams_table(text, n): one row per word n-gram with its position.

    >>> spark.sql("SELECT * FROM ngrams_table('a b c', 2)")
    [('a b', 0), ('b c', 1)]
    """

    def eval(self, text: str, n: int):  # noqa: D102 - contract defined by Spark
        if text is None or n is None or n <= 0:
            return
        words = text.split()
        for i in range(len(words) - n + 1):
            yield (" ".join(words[i : i + n]), i)


def register_udtfs(spark) -> None:
    """Register all engine UDTFs into the session catalog."""
    spark.udtf.register("ngrams_table", NgramUDTF)
