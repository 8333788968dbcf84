"""Property tests for the dialect's static folding machinery.

The reference-literal suite freezes observed cases; these properties
check the INVARIANTS behind the folds on randomized inputs:

- decimal-literal arithmetic folds match an independent high-precision
  Decimal computation under Presto's type rules (DecimalOperators);
- java_double_str is a round-trip rendering (float(s) == x) in Java's
  plain/scientific split;
- split() treats its delimiter literally, exactly like str.split with
  trailing empties kept;
- render_presto_json map-key ordering is the lexical order of the
  serialized keys.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal, localcontext

from hypothesis import given, settings, strategies as st

from prestodb_presto_spark.functions.json_static import (
    java_double_str,
    render_presto_json,
)

_dec = st.decimals(
    min_value=Decimal("-99999.999"),
    max_value=Decimal("99999.999"),
    allow_nan=False,
    allow_infinity=False,
    places=3,
)


@settings(max_examples=25, deadline=None)
@given(a=_dec, b=_dec, op=st.sampled_from(["+", "-", "*", "/"]))
def test_decimal_literal_arithmetic_matches_presto_rules(engine, a, b, op):
    if op == "/" and b == 0:
        return
    # independent expected value: Presto DecimalOperators result scale
    sa, sb = -a.as_tuple().exponent, -b.as_tuple().exponent
    pa = max(len(a.as_tuple().digits), sa + 1)
    pb = max(len(b.as_tuple().digits), sb + 1)
    with localcontext() as ctx:
        ctx.prec = 80
        if op in "+-":
            rs = max(sa, sb)
            v = a + b if op == "+" else a - b
        elif op == "*":
            rs = sa + sb
            v = a * b
        else:
            rs = max(sa, sb)
            v = a / b
        expected = v.quantize(Decimal(1).scaleb(-rs), rounding=ROUND_HALF_UP)
    got = engine.sql(
        f"SELECT DECIMAL '{a}' {op} DECIMAL '{b}' AS v", dialect="presto"
    ).collect()[0].v
    assert got == expected, (a, op, b, got, expected)
    assert got.as_tuple().exponent == -rs


@settings(max_examples=300, deadline=None)
@given(x=st.floats(allow_nan=False, allow_infinity=False))
def test_java_double_str_round_trips(x):
    s = java_double_str(x)
    assert float(s) == x
    # Java's plain/scientific split: plain iff 1e-3 <= |x| < 1e7 (or 0)
    if x != 0 and (abs(x) >= 1e7 or abs(x) < 1e-3):
        assert "E" in s, (x, s)
    else:
        assert "E" not in s and "." in s, (x, s)


@settings(max_examples=20, deadline=None)
@given(
    s=st.text(alphabet="ab.:x", max_size=12),
    d=st.sampled_from([".", "..", ":", "ab"]),
)
def test_split_is_literal_delimiter(engine, s, d):
    got = engine.sql(
        "SELECT split('{}', '{}') AS v".format(
            s.replace("'", "''"), d.replace("'", "''")
        ),
        dialect="presto",
    ).collect()[0].v
    assert got == s.split(d), (s, d, got)


def test_presto_json_map_keys_sort_lexically():
    node = (
        "map",
        [
            (("int", 2), ("int", 1)),
            (("int", 13), ("int", 2)),
            (("int", 1), ("null",)),
        ],
    )
    assert render_presto_json(node) == '{"1":null,"13":2,"2":1}'


def test_java_double_str_reference_forms():
    # the exact spellings the reference's JSON casts assert
    assert java_double_str(1e10) == "1.0E10"
    assert java_double_str(1e308) == "1.0E308"
    assert java_double_str(float("1e-323")) == "1.0E-323"
    assert java_double_str(3.14) == "3.14"
    assert java_double_str(0.0) == "0.0"
    assert java_double_str(float("nan")) == "NaN"
    assert java_double_str(float("-inf")) == "-Infinity"
