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


def shingles3_hashed(col="text"):
    """Distinct word-level 3-gram shingles as 64-bit hashes — no shingle
    STRING is ever materialized: ``xxhash64(w[i-1], w[i], w[i+1])``
    hashes each token triple directly (multi-arg xxhash64 chains the
    inputs through one seeded hash), so the per-shingle ``concat_ws``
    allocation+copy of :func:`shingles3` disappears and every downstream
    set operation (MIN accumulators, array_intersect verification) runs
    on fixed-width longs instead of variable-length strings.

    r14 (guide §1.2 per-row work + §2.3 narrower types): measured 2.0×
    on the shingle projection and 1.4× on the 64-MIN signature aggregate
    at sf0.1.  Distinct-hash sets equal distinct-string sets absent an
    intra-document 64-bit collision (~n²/2⁶⁵ per doc; the differential
    gate verifies the final pair sets exactly at every SF).  Used by the
    MinHash/LSH family, where shingles are only ever compared for
    EQUALITY; callers that expose shingle text keep :func:`shingles3`.
    """
    return F.expr(
        f"array_distinct(flatten(transform(array(split({col}, ' ')),"
        " w -> IF(size(w) < 3, array(),"
        " transform(sequence(1, size(w) - 2),"
        " i -> xxhash64(w[i-1], w[i], w[i+1]))))))"
    )


N_SIM_BITS = 60


def with_simhash64(df: DataFrame, tokens_col, out: str = "simhash") -> DataFrame:
    """Add a 60-bit SimHash fingerprint of a token-array column.

    Per token, a 60-bit md5-prefix hash (conv(substr(md5, 1, 15)) — the
    engine's cross-engine hash convention, see agg_checksum) supplies the
    bits; each bit position accumulates +1/-1 over the document; the
    sign vector folds into one long with shift+OR (bitwise — no ANSI
    overflow).  Map-side only.  md5 instead of xxhash64 keeps the
    fingerprint DuckDB-derivable, so dedup_simhash hash-matches the
    differential oracle instead of a rows-only check.
    """
    n = N_SIM_BITS
    # hash each token ONCE, then accumulate bits over the hash array.
    # r13: built as ONE SQL string — the Column-API form paid a py4j
    # round-trip per operator (60 shift/mask columns ≈ 0.3s of driver
    # time per query construction); the parsed plan is identical.
    hashes_sql = (
        "transform(__simtoks, w -> cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint))"
    )
    bits_sql = ", ".join(f"shiftright(h, {i}) & 1" for i in range(n))
    acc = F.expr(
        f"aggregate({hashes_sql}, array_repeat(0, {n}),"
        f" (a, h) -> zip_with(a, array({bits_sql}),"
        " (x, bit) -> x + IF(bit = 1, 1, -1)))"
    )
    fold = F.expr(
        f"aggregate(zip_with(_simacc, sequence(0, {n - 1}),"
        " (x, i) -> IF(x > 0, shiftleft(1L, i), 0L)), 0L, (acc, b) -> acc | b)"
    )
    return (
        df.withColumn("__simtoks", tokens_col)
        .withColumn("_simacc", acc)
        .withColumn(out, fold)
        .drop("_simacc", "__simtoks")
    )
