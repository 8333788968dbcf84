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


# --- winnowed span-dedup family: differential fuzz vs a Python model --------


def _winnow_model(texts: dict[int, str]):
    """Independent Python recompute of the dedup_spans_winnowed /
    dedup_spans_strip algorithm (same K/W, same md5-prefix hashes)."""
    import hashlib

    from prestodb_presto_spark.queries.textops import _WIN_K as K
    from prestodb_presto_spark.queries.textops import _WIN_W as W

    toks = {d: t.lower().strip().split(" ") for d, t in texts.items()}
    H = {}
    for d, tk in toks.items():
        m = len(tk) - K + 1
        if m < 1:
            continue
        H[d] = [
            int(hashlib.md5(" ".join(tk[i : i + K]).encode()).hexdigest()[:15], 16)
            for i in range(m)
        ]
    sels = {
        d: {min(h[j : j + W]) for j in range(max(1, len(h) - W + 1))}
        for d, h in H.items()
    }
    owners = {}
    for d, s in sels.items():
        for f in s:
            owners.setdefault(f, set()).add(d)
    shared = {f for f, ds in owners.items() if len(ds) > 1}
    flagged = {d for d, s in sels.items() if s & shared}
    winner = {}
    for d in sorted(flagged):
        for i, gh in enumerate(H[d]):
            winner.setdefault(gh, (d, i))
    strip = {}
    for d in sorted(flagged):
        losing = [i for i, gh in enumerate(H[d]) if winner[gh] != (d, i)]
        if not losing:
            continue
        rm = {p for i in losing for p in range(i, i + K)}
        kept = " ".join(w for p, w in enumerate(toks[d]) if p not in rm)
        strip[d] = (
            len(toks[d]),
            len(rm),
            hashlib.md5(kept.encode()).hexdigest(),
        )
    det = {d: bool(sels.get(d, set()) & shared) for d in sels}
    return det, strip


corpus_words = st.text(alphabet="abcde", min_size=1, max_size=3)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(corpus_words, min_size=8, max_size=24), min_size=3, max_size=6
    ),
    run=st.lists(st.sampled_from(["r1", "r2", "r3", "r4"]), min_size=11, max_size=14),
    data=st.data(),
)
def test_winnow_family_matches_python_model(spark, docs, run, data):
    """Random corpora with a planted >= 11-token shared run: detection
    flags and strip outputs must equal the Python model exactly, and the
    planted run's two hosts must both be flagged (the SIGMOD'03
    guarantee)."""
    from prestodb_presto_spark.queries.textops import (
        dedup_spans_strip,
        dedup_spans_winnowed,
    )

    a = data.draw(st.integers(0, len(docs) - 1))
    b = data.draw(st.integers(0, len(docs) - 1))
    texts = {}
    for i, d in enumerate(docs):
        tk = list(d)
        if i == a or i == b:
            at = data.draw(st.integers(0, len(tk)))
            tk = tk[:at] + run + tk[at:]
        texts[i] = " ".join(tk)
    det_exp, strip_exp = _winnow_model(texts)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(d, t, "en", "s", 0) for d, t in texts.items()],
            "doc_id int, text string, lang string, source string, n_chars int",
        ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        det_got = {
            r.doc_id: r.dup_flag for r in dedup_spans_winnowed(spark, tmp).collect()
        }
        strip_got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_md5)
            for r in dedup_spans_strip(spark, tmp).collect()
        }
    assert det_got == det_exp
    assert strip_got == strip_exp
    if a != b:
        assert det_exp[a] and det_exp[b]
