"""Tokenization, shingling, SimHash — pure JVM expressions (no Python UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_array(col="text"):
    """Whitespace tokens."""
    return F.split(F.col(col), " ")


def shingles3(col="text"):
    """Distinct word-level 3-gram shingles as one array expression (no explode).

    The token array is materialized once inside the expression (lambda
    binding) instead of re-splitting the text per shingle.  Docs with <3
    tokens yield an empty set — the guard is explicit because
    sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty.
    """
    return F.expr(
        f"array_distinct(flatten(transform(array(split({col}, ' ')),"
        " w -> IF(size(w) < 3, array(),"
        " transform(sequence(1, size(w) - 2),"
        " i -> concat_ws(' ', w[i-1], w[i], w[i+1]))))))"
    )


def with_simhash64(df: DataFrame, tokens_col, out: str = "simhash") -> DataFrame:
    """Add a 64-bit SimHash fingerprint of a token-array column.

    Per token, xxhash64 supplies 64 bits; each bit position accumulates
    +1/-1 over the document; the sign vector folds into one long with
    shift+OR (bitwise — no ANSI overflow at bit 63).  Map-side only.
    """
    acc = F.aggregate(
        tokens_col,
        F.array(*[F.lit(0)] * 64),
        lambda a, w: F.zip_with(
            a,
            F.array(
                *[F.shiftrightunsigned(F.xxhash64(w), i).bitwiseAND(F.lit(1)) for i in range(64)]
            ),
            lambda x, bit: x + F.when(bit == 1, 1).otherwise(-1),
        ),
    )
    fold = F.expr(
        "aggregate(zip_with(_simacc, sequence(0, 63),"
        " (x, i) -> IF(x > 0, shiftleft(1L, i), 0L)), 0L, (acc, b) -> acc | b)"
    )
    return df.withColumn("_simacc", acc).withColumn(out, fold).drop("_simacc")
