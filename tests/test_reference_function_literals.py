"""Run the reference's OWN scalar-function unit-test assertions.

tests/reference_literals.py scrapes presto-main's Test*.java
``assertFunction("<expr>", TYPE, <literal>)`` cases (1067 with plainly
parseable expected literals) from the read-only checkout and this
module executes every expression through Engine.sql(dialect="presto"),
comparing to the reference's expected value.

3971/3971 pass exactly — every parseable assertion in the
operator/scalar suites, the presto-main type-operator suites
(array/map/row/char/decimal/json operators, per-type arithmetic and
casts), and the expression-compiler suite (assertExecute/assertFilter,
incl. the bound_* input symbols from FunctionAssertions' SOURCE_PAGE) —
now also covering LIST/MAP-valued expectations (ImmutableList/
ImmutableMap/asList), assertDecimalFunction's decimal("..") digit
strings (value AND scale checked), and Presto's decimal-literal
arithmetic type rules folded statically in the dialect
(DecimalOperators: add/sub keep max scale at precision 38, divide keeps
scale max(s1,s2) with HALF_UP), at 100% in every file.  Highlights of how the last
deviations closed (all statically decidable dialect rewrites, no
engine-default changes):

  - fractional → integral casts round HALF_UP like the reference
    (DoubleOperators.castToLong / DecimalCasts) when the source is
    statically fractional; CAST to varchar(n) truncates and bare CHAR
    is CHAR(1) (TestCharacterStringCasts);
  - the harness lambda surface (apply/invoke/"$internal$bind")
    beta-reduces literal bindings so the cast rewrites see the bound
    value's type — apply(25.6E0, x -> CAST(x AS BIGINT)) = 26;
  - row(..) = row(..) decomposes field-wise so map-typed fields go
    through the map-equality compat (RowEqualOperator semantics);
  - element || array lowers to array_append/array_prepend
    (ArrayConcatUtils), concat over arrays with a literal NULL is
    NULL, and mixed decimal-scale array_position compares as DOUBLE;
  - interval → varchar casts render statically in the reference's
    canonical forms ('%d-%d' / '%d %02d:%02d:%02d.%03d');
  - IPADDRESS ordering compares the 16-byte IPv6 form via a
    fixed-width hex key UDF (IpAddressOperators), not canonical text;
  - BOOLEAN 'x' / DOUBLE PRECISION 'x' typed literals, and the
    harness-only functions (identityFunction, precomputed,
    null_function, bound_long) lowered from their sources;
  - 3 try{assertFunction(...);fail();} cases the reference EXPECTS to
    throw are excluded by the scraper (we raise too — correct).
"""

from __future__ import annotations

import math

import pytest

from tests.reference_literals import scrape

# exact-pass count per reference test file (current: 3971/3971 — all)
PASS_FLOORS = {
    "TestArrayExceptFunction.java": 17,
    "TestArrayFilterFunction.java": 19,
    "TestArrayOperators.java": 604,
    "TestArrayReduceFunction.java": 14,
    "TestArrayTransformFunction.java": 28,
    "TestBigintOperators.java": 59,
    "TestBitwiseFunctions.java": 15,
    "TestBlockAndPositionNullConvention.java": 2,
    "TestBooleanOperators.java": 47,
    "TestCharOperators.java": 104,
    "TestCharParametricType.java": 1,
    "TestCharacterStringCasts.java": 14,
    "TestConditions.java": 93,
    "TestCustomFunctions.java": 5,
    "TestDateBase.java": 31,
    "TestDateTimeFunctionsBase.java": 53,
    "TestDateTimeOperatorsBase.java": 12,
    "TestDecimalCasts.java": 215,
    "TestDecimalOperators.java": 488,
    "TestDecimalParametricType.java": 15,
    "TestDecimalToDecimalCasts.java": 34,
    "TestDoubleOperators.java": 67,
    "TestExpressionCompiler.java": 140,
    "TestInstanceFunction.java": 1,
    "TestIntegerOperators.java": 62,
    "TestIntervalDayTime.java": 40,
    "TestIntervalYearMonth.java": 40,
    "TestIpAddressOperators.java": 51,
    "TestIsNullAnnotation.java": 10,
    "TestJsonExtract.java": 1,
    "TestJsonFunctions.java": 134,
    "TestJsonOperators.java": 99,
    "TestLambdaExpression.java": 46,
    "TestLegacyMapSubscript.java": 1,
    "TestMapOperators.java": 143,
    "TestMathFunctions.java": 280,
    "TestRealOperators.java": 53,
    "TestRegexpFunctions.java": 75,
    "TestRowOperators.java": 71,
    "TestSmallintOperators.java": 48,
    "TestStringFunctions.java": 314,
    "TestTimeBase.java": 29,
    "TestTimeWithTimeZoneBase.java": 72,
    "TestTimestampBase.java": 43,
    "TestTimestampWithTimeZoneBase.java": 89,
    "TestTinyintOperators.java": 48,
    "TestTryFunction.java": 11,
    "TestTypeOfFunction.java": 20,
    "TestUnknownOperators.java": 17,
    "TestUrlFunctions.java": 10,
    "TestVarbinaryFunctions.java": 26,
    "TestVarcharOperators.java": 43,
    "TestWordStemFunction.java": 17,
}


def _matches(got, exp) -> bool:
    if exp is None:
        return got is None
    if isinstance(exp, bool):
        return got == exp
    if isinstance(exp, tuple) and len(exp) == 2 and exp[0] == "__decimal__":
        # assertDecimalFunction: leading zeros in the digit string pad to
        # the type's precision; the checkable parts are value and scale
        from decimal import Decimal

        if not isinstance(got, Decimal):
            return False
        want = Decimal(exp[1])
        return got == want and got.as_tuple().exponent == want.as_tuple().exponent
    if isinstance(exp, list):
        if not isinstance(got, (list, tuple)) or len(got) != len(exp):
            return False
        return all(_matches(g, e) for g, e in zip(got, exp))
    if isinstance(exp, dict):
        if not isinstance(got, dict) or len(got) != len(exp):
            return False
        unclaimed = list(got.items())
        for ek, ev in exp.items():
            hit = next(
                (
                    i
                    for i, (gk, gv) in enumerate(unclaimed)
                    if _matches(gk, ek) and _matches(gv, ev)
                ),
                None,
            )
            if hit is None:
                return False
            unclaimed.pop(hit)
        return True
    if isinstance(exp, float):
        if got is None or not isinstance(got, (int, float)):
            return False
        if math.isnan(exp):
            return isinstance(got, float) and math.isnan(got)
        return math.isclose(float(got), exp, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(exp, int):
        return got == exp and not isinstance(got, bool)
    if isinstance(got, (bytes, bytearray)):
        return got.decode("utf-8", "replace") == exp or got.hex().upper() == exp.upper()
    return str(got) == exp


# TestDateTimeFunctionsBase runs its session in Asia/Kabul
# (TIME_ZONE_KEY, TestDateTimeFunctionsBase.java:83); mirror that when
# evaluating its expressions so session-zone-sensitive cases compare
# like-for-like.
_SESSION_ZONE = {
    "TestDateTimeFunctionsBase.java": "Asia/Kabul",
    # FunctionAssertions' TestingSession zone
    "TestLambdaExpression.java": "Pacific/Kiritimati",
    "TestArrayTransformFunction.java": "Pacific/Kiritimati",
    # type-operator suites pin their own session zones
    "TestTimeWithTimeZoneBase.java": "+06:09",
    "TestTimestampWithTimeZoneBase.java": "+06:09",
    "TestDateTimeOperatorsBase.java": "Europe/Berlin",
}


def test_reference_assert_function_literals(engine):
    cases = list(scrape())
    if not cases:
        pytest.skip("reference checkout not present")
    passed: dict[str, int] = {}
    totals: dict[str, int] = {}
    regressions: list[str] = []
    spark = engine.spark
    default_tz = spark.conf.get("spark.sql.session.timeZone")
    for f, expr, exp in cases:
        totals[f] = totals.get(f, 0) + 1
        tz = _SESSION_ZONE.get(f, default_tz)
        try:
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = engine.sql(f"SELECT {expr} AS v", dialect="presto").collect()[0].v
        except Exception:
            continue
        finally:
            spark.conf.set("spark.sql.session.timeZone", default_tz)
        if _matches(got, exp):
            passed[f] = passed.get(f, 0) + 1
    for f, floor in PASS_FLOORS.items():
        got_n = passed.get(f, 0)
        if got_n < floor:
            regressions.append(f"{f}: {got_n} < floor {floor}")
    assert not regressions, f"literal-parity regressions: {regressions}"
    # keep the headline honest: overall floor
    assert sum(passed.values()) >= 3971, sum(passed.values())
