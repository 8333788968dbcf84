"""Color/ANSI rendering scalars — ColorFunctions.java, bit-exact.

color(varchar) → the COLOR type's long encoding (css #rgb parsed to
24-bit RGB; the 8 system colors as -(index+1)); rgb(r,g,b); the
interpolating color(fraction|value, ...) overloads; render(value,
color) wrapping in ESC[38;5;<ansi>m ... ESC[0m; bar(percent, width) —
the HSB-interpolated unicode bar the CLI draws.

Parity notes (TestColorFunctions.java goldens are replayed verbatim in
tests/test_color_functions.py):

  - the HSB interpolation must reproduce java.awt.Color.RGBtoHSB /
    HSBtoRGB including their 32-bit float arithmetic — one ULP of
    drift can shift a rounded channel across a 6/256 ANSI bucket, so
    every intermediate runs in numpy float32 exactly as OpenJDK's
    float expressions do;
  - toAnsi rescales channels to the 6x6x6 ANSI cube: 16 + 36r + 6g + b.

These are CLI presentation toys (the reference uses them only in its
shell renderer), so the Spark tier is an Arrow-batched pandas UDF —
never a hot path; registered for SHOW FUNCTIONS/name parity and the
occasional SELECT render(...).
"""

from __future__ import annotations

import numpy as np

from prestodb_presto_spark.functions import register
from prestodb_presto_spark.functions._util import c

ANSI_RESET = "[0m"

_SYSTEM = {
    "black": 0, "red": 1, "green": 2, "yellow": 3,
    "blue": 4, "magenta": 5, "cyan": 6, "white": 7,
}

_f32 = np.float32


def rgb_scalar(red: int, green: int, blue: int) -> int:
    for name, v in (("red", red), ("green", green), ("blue", blue)):
        if not 0 <= v <= 255:
            raise ValueError(f"{name} must be between 0 and 255")
    return (red << 16) | (green << 8) | blue


def _parse_rgb(s: str) -> int:
    """#rgb css shorthand → 24-bit RGB, or -1 (ColorFunctions.parseRgb)."""
    if len(s) != 4 or s[0] != "#":
        return -1
    try:
        r, g, b = (int(ch, 16) for ch in s[1:])
    except ValueError:
        return -1
    return rgb_scalar((r << 4) | r, (g << 4) | g, (b << 4) | b)


def color_scalar(s: str) -> int:
    v = _parse_rgb(s)
    if v != -1:
        return v
    idx = _SYSTEM.get(s.lower())
    if idx is None:
        raise ValueError(f"Invalid color: '{s}'")
    return -(idx + 1)


def _rgb_to_hsb(r: int, g: int, b: int):
    """java.awt.Color.RGBtoHSB, float32-faithful."""
    cmax, cmin = max(r, g, b), min(r, g, b)
    brightness = _f32(cmax) / _f32(255.0)
    saturation = _f32(cmax - cmin) / _f32(cmax) if cmax != 0 else _f32(0.0)
    if saturation == 0:
        hue = _f32(0.0)
    else:
        span = _f32(cmax - cmin)
        redc = _f32(cmax - r) / span
        greenc = _f32(cmax - g) / span
        bluec = _f32(cmax - b) / span
        if r == cmax:
            hue = bluec - greenc
        elif g == cmax:
            hue = _f32(2.0) + redc - bluec
        else:
            hue = _f32(4.0) + greenc - redc
        hue = hue / _f32(6.0)
        if hue < 0:
            hue = hue + _f32(1.0)
    return hue, saturation, brightness


def _hsb_to_rgb(hue, saturation, brightness) -> int:
    """java.awt.Color.HSBtoRGB, float32-faithful (incl. the
    (int)(x*255+0.5) channel rounding)."""
    def ch(x):
        return int(x * _f32(255.0) + _f32(0.5))

    if saturation == 0:
        r = g = b = ch(brightness)
    else:
        h = (hue - _f32(np.floor(hue))) * _f32(6.0)
        f = h - _f32(np.floor(h))
        p = brightness * (_f32(1.0) - saturation)
        q = brightness * (_f32(1.0) - saturation * f)
        t = brightness * (_f32(1.0) - saturation * (_f32(1.0) - f))
        case = int(h)
        if case == 0:
            r, g, b = ch(brightness), ch(t), ch(p)
        elif case == 1:
            r, g, b = ch(q), ch(brightness), ch(p)
        elif case == 2:
            r, g, b = ch(p), ch(brightness), ch(t)
        elif case == 3:
            r, g, b = ch(p), ch(q), ch(brightness)
        elif case == 4:
            r, g, b = ch(t), ch(p), ch(brightness)
        else:
            r, g, b = ch(brightness), ch(p), ch(q)
    return (r << 16) | (g << 8) | b


def interpolate(fraction: float, low_rgb: int, high_rgb: int) -> int:
    lh, ls, lv = _rgb_to_hsb((low_rgb >> 16) & 0xFF, (low_rgb >> 8) & 0xFF, low_rgb & 0xFF)
    hh, hs, hv = _rgb_to_hsb((high_rgb >> 16) & 0xFF, (high_rgb >> 8) & 0xFF, high_rgb & 0xFF)
    fr = _f32(fraction)
    h = fr * (hh - lh) + lh
    s = fr * (hs - ls) + ls
    v = fr * (hv - lv) + lv
    return _hsb_to_rgb(h, s, v) & 0xFFFFFF


def color_interp_scalar(fraction: float, low_color: int, high_color: int) -> int:
    if low_color < 0 or high_color < 0:
        raise ValueError("interpolation endpoints must be RGB colors")
    fraction = max(0.0, min(1.0, fraction))
    return interpolate(fraction, low_color, high_color)


def color_value_scalar(value, low, high, low_color, high_color) -> int:
    # r13 (ADVICE): high == low must not raise — Java computes a ±Inf/NaN
    # double that the [0,1] clamp absorbs (ColorFunctions.java color(double,..)
    # via interpolate); mirror the clamped limit instead of ZeroDivisionError:
    # value above the (degenerate) range → 1.0 → high_color, at/below → 0.0.
    num = (value - low) * 1.0
    den = (high - low) * 1.0
    if den == 0.0:
        fraction = 1.0 if num > 0 else 0.0
    else:
        fraction = num / den
    return color_interp_scalar(fraction, low_color, high_color)


def _to_ansi(color: int) -> int:
    if color >= 0:
        r, g, b = (color >> 16) & 0xFF, (color >> 8) & 0xFF, color & 0xFF
        return 16 + (r * 6 // 256) * 36 + (g * 6 // 256) * 6 + (b * 6 // 256)
    return -color - 1


def _escape(color: int) -> str:
    return f"[38;5;{_to_ansi(color)}m"


def render_scalar(value, color: int) -> str:
    if isinstance(value, bool):  # render(boolean): ✓ green / ✗ red
        return render_scalar("✓", color_scalar("green")) if value else render_scalar(
            "✗", color_scalar("red")
        )
    return f"{_escape(color)}{value}{ANSI_RESET}"


def bar_scalar(percent: float, width: int, low_color: int | None = None,
               high_color: int | None = None) -> str:
    if low_color is None:
        low_color = rgb_scalar(255, 0, 0)
    if high_color is None:
        high_color = rgb_scalar(0, 255, 0)
    count = int(percent * width)
    count = max(0, min(width, count))
    out = []
    for i in range(count):
        # r13 (ADVICE): width == 1 must not raise — Java's 0/0 float is a
        # NaN whose whole HSB chain collapses through Math.round(NaN) == 0;
        # the deterministic non-crashing analog is fraction 0.0 (the
        # low_color endpoint) for the single cell.
        fraction = _f32(i * 1.0 / (width - 1)) if width > 1 else _f32(0.0)
        out.append(_escape(interpolate(fraction, low_color, high_color)))
        out.append("█")
    out.append(ANSI_RESET)
    out.append(" " * (width - count))
    return "".join(out)


# --- registry tier (Arrow-batched pandas UDFs; presentation-only) --------


@register("color")
def color(x, *rest):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if len(rest) == 2:
        low, high = rest

        @pandas_udf("long")
        def _interp(fr):
            return pd.Series(
                [None if f is None else color_interp_scalar(float(f), low, high) for f in fr]
            )

        return _interp(c(x))
    if len(rest) == 4:
        low_v, high_v, low_c, high_c = rest

        @pandas_udf("long")
        def _interp_v(vals):
            return pd.Series(
                [
                    None
                    if v is None
                    else color_value_scalar(float(v), low_v, high_v, low_c, high_c)
                    for v in vals
                ]
            )

        return _interp_v(c(x))

    @pandas_udf("long")
    def _color(s):
        return pd.Series([None if v is None else color_scalar(v) for v in s])

    return _color(c(x))


@register("rgb")
def rgb(r, g, b):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _rgb(rr, gg, bb):
        return pd.Series(
            [
                None if x is None or y is None or z is None else rgb_scalar(int(x), int(y), int(z))
                for x, y, z in zip(rr, gg, bb)
            ]
        )

    return _rgb(c(r), c(g), c(b))


@register("render")
def render(x, color_code=None):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if color_code is None:

        @pandas_udf("string")
        def _render_bool(s):
            return pd.Series([None if v is None else render_scalar(bool(v), 0) for v in s])

        return _render_bool(c(x))

    @pandas_udf("string")
    def _render(s, col):
        return pd.Series(
            [
                None if v is None or k is None else render_scalar(v, int(k))
                for v, k in zip(s, col)
            ]
        )

    return _render(c(x), c(color_code))


@register("bar")
def bar(percent, width, low_color=None, high_color=None):
    import pandas as pd
    from pyspark.sql.functions import lit, pandas_udf

    lo = low_color if low_color is not None else rgb_scalar(255, 0, 0)
    hi = high_color if high_color is not None else rgb_scalar(0, 255, 0)

    @pandas_udf("string")
    def _bar(p, w):
        return pd.Series(
            [
                None if pp is None or ww is None else bar_scalar(float(pp), int(ww), lo, hi)
                for pp, ww in zip(p, w)
            ]
        )

    wcol = c(width) if not isinstance(width, int) else lit(width)
    return _bar(c(percent), wcol)
