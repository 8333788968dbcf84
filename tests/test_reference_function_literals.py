"""Run the reference's OWN scalar-function unit-test assertions.

tests/reference_literals.py scrapes presto-main's Test*.java
``assertFunction("<expr>", TYPE, <literal>)`` cases (1067 with plainly
parseable expected literals) from the read-only checkout and this
module executes every expression through Engine.sql(dialect="presto"),
comparing to the reference's expected value.

3027/3078 pass exactly (the scrape now also runs the presto-main type-operator suites — array/map/row/char/decimal/json operators, per-type arithmetic and casts).  The rest are DOCUMENTED deviation categories —
asserted here as per-file minimum pass counts so any regression in the
dialect/registry trips immediately while known gaps stay visible:

  - the full TEST-harness surface is lowered too: apply()/invoke()/
    "$internal$bind"/"$internal$try" as scalar lambda application via
    single-element transform chains (dialect._harness_lambda_compat),
    and custom_add/custom_is_null/test_is_null* from their harness
    sources — the ONE remaining miss is apply(25.6E0,
    x -> CAST(x AS BIGINT)): Presto rounds double->bigint casts,
    Spark truncates (documented cast posture);
  - TestStringFunctions: 282/282 — CHAR-typed `=` comparisons
    resolve via the dialect's char-equality compat (rtrim both
    sides when an operand carries a CHAR cast) and the harness vl()
    probe resolves statically;
  - TestMathFunctions: 272/272 — the Presto arithmetic posture
    (int/int integer division, x/0.0 → ±Infinity/NaN) is recovered by
    statically decidable dialect rewrites (dialect._division_compat),
    and normal_cdf/inverse_normal_cdf reflect into the same
    commons-math3 Erf the reference uses;
  - TestTypeOfFunction: 20/20 (static VARCHAR-length shapes are
    resolved in the dialect; runtime spellings mapped);
  - TestWordStemFunction: 17/17 — from-scratch Porter2 for 'en'
    (porter2.py) and core Snowball for fr/es/pt/it/de (snowball.py);
  - TestDateTimeFunctionsBase: 53/53 under the mirrored Asia/Kabul
    session zone (see _SESSION_ZONE below).
"""

from __future__ import annotations

import math

import pytest

from tests.reference_literals import scrape

# minimum exact-pass count per reference test file (current: 3027/3078)
PASS_FLOORS = {
    "TestArrayExceptFunction.java": 3,
    "TestArrayOperators.java": 372,
    "TestArrayReduceFunction.java": 14,
    "TestBigintOperators.java": 59,
    "TestBitwiseFunctions.java": 15,
    "TestBlockAndPositionNullConvention.java": 0,
    "TestBooleanOperators.java": 45,
    "TestCharOperators.java": 104,
    "TestCharParametricType.java": 1,
    "TestCharacterStringCasts.java": 7,
    "TestConditions.java": 93,
    "TestCustomFunctions.java": 5,
    "TestDateBase.java": 31,
    "TestDateTimeFunctionsBase.java": 53,
    "TestDateTimeOperatorsBase.java": 12,
    "TestDecimalCasts.java": 70,
    "TestDecimalOperators.java": 277,
    "TestDoubleOperators.java": 60,
    "TestInstanceFunction.java": 0,
    "TestIntegerOperators.java": 62,
    "TestIntervalDayTime.java": 39,
    "TestIntervalYearMonth.java": 39,
    "TestIpAddressOperators.java": 50,
    "TestIsNullAnnotation.java": 10,
    "TestJsonExtract.java": 1,
    "TestJsonFunctions.java": 134,
    "TestJsonOperators.java": 99,
    "TestLambdaExpression.java": 41,
    "TestLegacyMapSubscript.java": 1,
    "TestMapOperators.java": 132,
    "TestMathFunctions.java": 272,
    "TestRealOperators.java": 51,
    "TestRegexpFunctions.java": 60,
    "TestRowOperators.java": 65,
    "TestSmallintOperators.java": 48,
    "TestStringFunctions.java": 282,
    "TestTimeBase.java": 29,
    "TestTimeWithTimeZoneBase.java": 72,
    "TestTimestampBase.java": 43,
    "TestTimestampWithTimeZoneBase.java": 89,
    "TestTinyintOperators.java": 48,
    "TestTryFunction.java": 10,
    "TestTypeOfFunction.java": 20,
    "TestUnknownOperators.java": 13,
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
    assert sum(passed.values()) >= 3027, sum(passed.values())
