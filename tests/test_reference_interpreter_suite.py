"""Run the reference's expression-interpreter tests differentially.

presto-main's TestExpressionInterpreter asserts that its constant
folder optimizes one expression into another:

    assertOptimizedEquals("3 + 4", "7")

Optimizer equivalence implies VALUE equivalence under the same bound
inputs, so each scrapeable pair evaluates BOTH sides through
Engine.sql(dialect="presto") and compares results.  The harness's
bound_* symbols (TestExpressionInterpreter.optimize's symbol resolver)
substitute as literals before translation; pairs referencing unbound_*
symbols (no values exist) or random() (nondeterministic by design) are
out of scope.
"""

from __future__ import annotations

import math
import re
from decimal import Decimal

import pytest

REF_FILE = (
    "/root/reference/presto-main/src/test/java/com/facebook/presto/sql"
    "/TestExpressionInterpreter.java"
)

# TestExpressionInterpreter.java:1384 symbol resolver values
_BINDINGS = [
    ("bound_decimal_short", "DECIMAL '123.45'"),
    ("bound_decimal_long", "DECIMAL '12345678901234567890.123'"),
    ("bound_varbinary", "X'ab'"),
    ("bound_timestamp_with_timezone", "TIMESTAMP '1970-01-01 01:00:00.999 UTC'"),
    ("bound_timestamp", "TIMESTAMP '2001-08-22 03:04:05.321'"),
    ("bound_date", "DATE '2001-08-22'"),
    ("bound_time", "TIME '03:04:05.321'"),
]


def _junescape(s: str) -> str:
    return s.replace('\\"', '"').replace("\\\\", "\\").replace("\\n", "\n")


def scrape_pairs():
    try:
        src = open(REF_FILE).read()
    except OSError:
        return []
    cases = re.findall(
        r'assertOptimizedEquals\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*'
        r'"((?:[^"\\]|\\.)*)"\)',
        src,
    )
    pairs = []
    for a, b in cases:
        text = a + b
        # no values exist for unbound_* symbols or the quoted reserved
        # identifier probe; random() is nondeterministic by design
        if "unbound" in text or "random()" in text or '\\"time\\"' in text:
            continue
        a, b = _junescape(a), _junescape(b)
        for sym, val in _BINDINGS:
            a = re.sub(rf"\b{sym}\b", val, a)
            b = re.sub(rf"\b{sym}\b", val, b)
        pairs.append((a, b))
    return pairs


def _norm(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if isinstance(v, Decimal):
        return ("n", v)
    if isinstance(v, int):
        return ("n", Decimal(v))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((repr(k), _norm(x)) for k, x in v.items()))
    return v


def test_reference_interpreter_pairs(engine):
    pairs = scrape_pairs()
    if not pairs:
        pytest.skip("reference checkout not present")
    ok = 0
    fails = []
    for a, b in pairs:
        try:
            va = engine.sql(f"SELECT {a} AS v", dialect="presto").collect()[0].v
            vb = engine.sql(f"SELECT {b} AS v", dialect="presto").collect()[0].v
        except Exception as e:
            fails.append((a, b, str(e)[:90]))
            continue
        if _norm(va) == _norm(vb):
            ok += 1
        else:
            fails.append((a, b, f"{va!r} != {vb!r}"))
    # floor frozen at the audited level; see module docstring
    assert ok >= OVERALL_FLOOR, (ok, len(pairs), fails[:5])


OVERALL_FLOOR = 386  # of 386 scrapeable pairs — all
