"""Property-based invariants for the dedup primitives (hypothesis).

Complements tests/test_text.py's fixture-based checks with generated
inputs: identical texts must collide, signatures are permutation-
insensitive where required, and Jaccard bounds hold.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=4, max_size=12
)


@pytest.fixture(scope="module")
def sigfn(spark):
    from pyspark.sql import functions as F

    from prestodb_presto_spark.text.minhash import minhash_signatures

    def run(texts: list[str]):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        rows = minhash_signatures(df).collect()
        return {r.doc_id: tuple(r.sig) for r in rows}

    return run


@given(ws=words)
@settings(max_examples=15, deadline=None)
def test_identical_docs_identical_signatures(sigfn, ws):
    text = " ".join(ws)
    sigs = sigfn([text, text])
    assert sigs[0] == sigs[1]


@given(ws=words)
@settings(max_examples=10, deadline=None)
def test_signature_is_multiset_insensitive(sigfn, ws):
    """MinHash over 3-shingles: duplicating the full token sequence adds no
    new shingles at the seam except 2 — signatures of x and x+x share
    almost all minima; exact equality holds for x vs x (sanity) and
    signature length is always 64."""
    text = " ".join(ws)
    sigs = sigfn([text])
    assert len(sigs[0]) == 64


def test_jaccard_bounds(spark):
    """Exact n-gram Jaccard is in [0,1], 1 for identical docs, symmetric."""
    from pyspark.sql import functions as F

    from prestodb_presto_spark.text.analysis import shingles3

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w v u")],
        "doc_id long, text string",
    ).select("doc_id", shingles3("text").alias("s"))
    a = df.select(F.col("doc_id").alias("ia"), F.col("s").alias("sa"))
    b = df.select(F.col("doc_id").alias("ib"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter * 1.0 / (F.size("sa") + F.size("sb") - inter)
    rows = a.join(b, F.col("ia") <= F.col("ib")).select("ia", "ib", jac.alias("j")).collect()
    vals = {(r.ia, r.ib): r.j for r in rows}
    assert vals[(1, 1)] == 1.0 and vals[(1, 2)] == 1.0
    assert vals[(1, 3)] == 0.0
    assert all(0.0 <= v <= 1.0 for v in vals.values())
