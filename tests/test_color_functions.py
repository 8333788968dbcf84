"""Color/ANSI functions — TestColorFunctions.java replayed verbatim
(every literal golden from the reference's test file, including the
float32-sensitive HSB-interpolated bars)."""

from __future__ import annotations

import pytest

from prestodb_presto_spark.functions.color import (
    _parse_rgb,
    bar_scalar,
    color_scalar,
    color_value_scalar,
    interpolate,
    render_scalar,
    rgb_scalar,
)


def test_parse_rgb():
    assert _parse_rgb("#000") == 0x000000
    assert _parse_rgb("#FFF") == 0xFFFFFF
    assert _parse_rgb("#F00") == 0xFF0000
    assert _parse_rgb("#0F0") == 0x00FF00
    assert _parse_rgb("#00F") == 0x0000FF
    assert _parse_rgb("#700") == 0x770000
    assert _parse_rgb("#070") == 0x007700
    assert _parse_rgb("#007") == 0x000077
    assert _parse_rgb("#cde") == 0xCCDDEE


def test_rgb_and_components():
    assert rgb_scalar(0xFF, 0, 0) == 0xFF0000
    assert rgb_scalar(0, 0xFF, 0) == 0x00FF00
    assert rgb_scalar(0, 0, 0xFF) == 0x0000FF
    with pytest.raises(ValueError, match="must be between"):
        rgb_scalar(256, 0, 0)
    v = _parse_rgb("#789")
    assert (v >> 16) & 0xFF == 0x77 and (v >> 8) & 0xFF == 0x88 and v & 0xFF == 0x99


def test_color():
    assert color_scalar("black") == -1
    assert color_scalar("red") == -2
    assert color_scalar("green") == -3
    assert color_scalar("yellow") == -4
    assert color_scalar("blue") == -5
    assert color_scalar("magenta") == -6
    assert color_scalar("cyan") == -7
    assert color_scalar("white") == -8
    assert color_scalar("#f00") == 0xFF0000
    assert color_scalar("#0f0") == 0x00FF00
    assert color_scalar("#00f") == 0x0000FF
    with pytest.raises(ValueError, match="Invalid color"):
        color_scalar("burgundy")


def test_bar_goldens():
    """The two bar() goldens from TestColorFunctions.testBar — exact,
    including every interpolated ANSI index (float32-faithful HSB)."""
    assert bar_scalar(0.6, 5, color_scalar("#f0f"), color_scalar("#00f")) == (
        "[38;5;201m█[38;5;165m█[38;5;129m█[0m  "
    )
    assert bar_scalar(1, 10, color_scalar("#f00"), color_scalar("#0f0")) == (
        "[38;5;196m█[38;5;202m█[38;5;208m█"
        "[38;5;214m█[38;5;226m█[38;5;226m█"
        "[38;5;154m█[38;5;118m█[38;5;82m█"
        "[38;5;46m█[0m"
    )


def test_render_goldens():
    assert render_scalar(True, 0) == "[38;5;2m✓[0m"
    assert render_scalar(False, 0) == "[38;5;1m✗[0m"
    assert render_scalar("hello", color_scalar("red")) == "[38;5;1mhello[0m"
    assert render_scalar("hello", color_scalar("#f00")) == "[38;5;196mhello[0m"
    assert render_scalar("hello", color_scalar("#0f0")) == "[38;5;46mhello[0m"
    assert render_scalar("hello", color_scalar("#00f")) == "[38;5;21mhello[0m"
    assert render_scalar(1234, color_scalar("red")) == "[38;5;1m1234[0m"


def test_interpolation_endpoints_and_clamp():
    lo, hi = color_scalar("#f00"), color_scalar("#0f0")
    assert color_value_scalar(0, 0, 100, lo, hi) == lo
    assert color_value_scalar(100, 0, 100, lo, hi) == hi
    assert color_value_scalar(-50, 0, 100, lo, hi) == lo   # truncated
    assert color_value_scalar(999, 0, 100, lo, hi) == hi
    assert interpolate(0.0, lo, hi) == lo and interpolate(1.0, lo, hi) == hi
    with pytest.raises(ValueError, match="RGB"):
        color_value_scalar(1, 0, 2, color_scalar("red"), hi)


def test_registry_spark_tier(spark):
    """The registered color/rgb/render/bar names work as Spark columns
    (Arrow-batched UDF tier — presentation-only by design)."""
    from prestodb_presto_spark import functions as freg

    df = spark.createDataFrame(
        [("red", 0.6), ("#0f0", 1.0)], "cname string, pct double"
    )
    P = freg.presto
    out = df.select(
        P.color("cname").alias("code"),
        P.render(df.cname, P.color("cname")).alias("rendered"),
        P.bar("pct", 5).alias("b"),
        P.rgb(F_lit(255), F_lit(0), F_lit(0)).alias("r"),
    ).collect()
    assert out[0].code == -2 and out[1].code == 0x00FF00
    assert out[0].rendered == "[38;5;1mred[0m"
    assert out[0].b.endswith("[0m  ") and out[1].r == 0xFF0000
    names = set(freg.coverage())
    assert {"color", "rgb", "render", "bar"} <= names


from pyspark.sql.functions import lit as F_lit  # noqa: E402


def test_degenerate_width_and_range_do_not_raise():
    """r13 (ADVICE): bar(p, 1) and color(v, low, low, ..) raised
    ZeroDivisionError where the reference's float math flows a NaN/Inf
    through the clamp - both must return deterministically instead."""
    lo, hi = color_scalar("#f00"), color_scalar("#0f0")
    assert bar_scalar(1.0, 1, lo, hi)  # one-cell bar renders, no crash
    assert bar_scalar(0.0, 1, lo, hi)  # empty bar, no crash
    # degenerate range: above -> high endpoint, at/below -> low endpoint
    assert color_value_scalar(5, 3, 3, lo, hi) == hi
    assert color_value_scalar(3, 3, 3, lo, hi) == lo
    assert color_value_scalar(1, 3, 3, lo, hi) == lo
