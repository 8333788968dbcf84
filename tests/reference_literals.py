"""Scraper for the reference's scalar-function unit tests.

Extracts single-line ``assertFunction("<expr>", TYPE, <expected>);``
cases from presto-main's Test*.java (read from the read-only checkout at
test time, never copied) and keeps those whose expected value is a plain
Java literal we can parse: string, integer (incl. hex / L suffix),
float, boolean, or null.  Everything else (constructed objects, lists,
constants) is out of scope for the literal runner — the differential
gate and function unit tests cover those paths.
"""

from __future__ import annotations

import glob
import re

REF_TEST_DIR = (
    "/root/reference/presto-main/src/test/java/com/facebook/presto/operator/scalar"
)
# the type-operator suites (comparisons, casts, per-type arithmetic,
# array/map/row operators) use the same assertFunction idiom
REF_TYPE_TEST_DIR = (
    "/root/reference/presto-main/src/test/java/com/facebook/presto/type"
)

_CASE = re.compile(
    r'assertFunction\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*'
    r"([A-Za-z_][A-Za-z_0-9().,\" ]*?)\s*,\s*"
    r"(.+?)\);\s*$"
)
# the expression-compiler suite uses the same idiom under different
# names: assertExecute("<expr>", TYPE, <expected>) and
# assertFilter("<expr>", <bool>) (TestExpressionCompiler.java)
REF_EXPR_COMPILER = (
    "/root/reference/presto-main/src/test/java/com/facebook/presto/sql/gen"
    "/TestExpressionCompiler.java"
)
_EXEC_CASE = re.compile(
    r'assertExecute\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*'
    r"([A-Za-z_][A-Za-z_0-9().,\" ]*?)\s*,\s*"
    r"(.+?)\);\s*$"
)
_FILTER_CASE = re.compile(
    r'assertFilter\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*(true|false)\);\s*$'
)
# assertDecimalFunction("<expr>", decimal("<digits>")) — the digit
# string encodes the expected DECIMAL value (leading zeros pad to the
# type's precision; the numeric value and scale are what we can check)
_DECIMAL_CASE = re.compile(
    r'assertDecimalFunction\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*'
    r'decimal\("([^"]*)"\)\);\s*$'
)

_INT = re.compile(r"^[+-]?(0x[0-9a-fA-F]+|\d+)L?$")
_FLOAT = re.compile(r"^[+-]?(\d+\.\d*([eE][+-]?\d+)?|\d+[eE][+-]?\d+)$")
_STR = re.compile(r'^"((?:[^"\\]|\\.)*)"$')


def _junescape(s: str) -> str:
    """Decode Java string escapes (\\n, \\\", \\uXXXX...)."""
    return s.encode("utf-8").decode("unicode_escape").encode("latin-1", "surrogatepass").decode(
        "utf-16", "surrogatepass"
    ) if False else _junescape_simple(s)


def _junescape_simple(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        nxt = s[i + 1]
        if nxt == "u":
            out.append(chr(int(s[i + 2 : i + 6], 16)))
            i += 6
        elif nxt == "n":
            out.append("\n")
            i += 2
        elif nxt == "t":
            out.append("\t")
            i += 2
        elif nxt == "r":
            out.append("\r")
            i += 2
        elif nxt == "0":
            out.append("\0")
            i += 2
        else:  # \\ \" \' etc
            out.append(nxt)
            i += 2
    # merge surrogate pairs that java spells as two \uXXXX escapes
    return "".join(out).encode("utf-16", "surrogatepass").decode("utf-16")


_LIST_CTORS = ("ImmutableList.of(", "asList(", "Lists.newArrayList(")
_MAP_CTOR = "ImmutableMap.of("


def _split_top_args(s: str) -> list[str] | None:
    """Split comma-separated Java args at paren depth 0 (quote-aware)."""
    parts, depth, buf, i, n = [], 0, "", 0, len(s)
    while i < n:
        ch = s[i]
        if ch == '"':
            j = i + 1
            while j < n:
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == '"':
                    break
                j += 1
            buf += s[i : j + 1]
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return None
        if ch == "," and depth == 0:
            parts.append(buf)
            buf = ""
        else:
            buf += ch
        i += 1
    parts.append(buf)
    return parts


def parse_expected(raw: str):
    """Returns (ok, value)."""
    raw = raw.strip()
    if raw == "null":
        return True, None
    if raw in ("true", "false"):
        return True, raw == "true"
    if _INT.match(raw):
        body = raw.rstrip("L")
        return True, int(body, 16) if "0x" in body.lower() else int(body)
    if _FLOAT.match(raw):
        return True, float(raw)
    m = _STR.match(raw)
    if m:
        return True, _junescape_simple(m.group(1))
    dm = re.fullmatch(r'decimal\("([^"]*)"\)', raw)
    if dm:
        return True, ("__decimal__", dm.group(1))
    # Java collection constructors with plainly-literal elements
    # (ImmutableList.of(1, 2), asList(false, null),
    # ImmutableMap.of("a", 1)) — recursive; a non-literal element
    # (constructed object) rejects the whole case
    for ctor in _LIST_CTORS:
        if raw.startswith(ctor) and raw.endswith(")"):
            inner = raw[len(ctor) : -1].strip()
            if not inner:
                return True, []
            parts = _split_top_args(inner)
            if parts is None:
                return False, None
            vals = []
            for p in parts:
                ok, v = parse_expected(p)
                if not ok:
                    return False, None
                vals.append(v)
            return True, vals
    if raw.startswith(_MAP_CTOR) and raw.endswith(")"):
        inner = raw[len(_MAP_CTOR) : -1].strip()
        if not inner:
            return True, {}
        parts = _split_top_args(inner)
        if parts is None or len(parts) % 2:
            return False, None
        items = []
        for p in parts:
            ok, v = parse_expected(p)
            if not ok:
                return False, None
            items.append(v)
        return True, dict(zip(items[0::2], items[1::2]))
    return False, None


def scrape(files: list[str] | None = None):
    """Yield (file, expr_sql, expected) for parseable cases."""
    paths = files or sorted(
        glob.glob(f"{REF_TEST_DIR}/Test*.java")
        + glob.glob(f"{REF_TYPE_TEST_DIR}/Test*.java")
        + glob.glob(REF_EXPR_COMPILER)
    )
    for path in paths:
        lines = open(path).read().splitlines()
        is_compiler = path.endswith("TestExpressionCompiler.java")
        for i, line in enumerate(lines):
            dm = _DECIMAL_CASE.search(line)
            if dm:
                nxt = next(
                    (l.strip() for l in lines[i + 1 : i + 3] if l.strip()), ""
                )
                if not nxt.startswith("fail("):
                    yield (
                        path.rsplit("/", 1)[-1],
                        _junescape_simple(dm.group(1)),
                        ("__decimal__", dm.group(2)),
                    )
                continue
            if is_compiler:
                fm = _FILTER_CASE.search(line)
                if fm:
                    # a filter DROPS the row on NULL (FilterAndProject
                    # semantics) — assertFilter expects false for NULL
                    # predicates, so compare the kept/dropped outcome
                    yield (
                        path.rsplit("/", 1)[-1],
                        "COALESCE((" + _junescape_simple(fm.group(1)) + "), FALSE)",
                        fm.group(2) == "true",
                    )
                    continue
                m = _EXEC_CASE.search(line)
            else:
                m = _CASE.search(line)
            if not m:
                continue
            # a handful of reference cases wrap assertFunction in
            # try { assertFunction(...); fail(...); } catch — the
            # assertion is EXPECTED to throw (TestArrayOperators.java:453
            # et al.); skip those, they are not value assertions
            nxt = next(
                (l.strip() for l in lines[i + 1 : i + 3] if l.strip()), ""
            )
            if nxt.startswith("fail("):
                continue
            expr_raw, _type, expected_raw = m.groups()
            ok, expected = parse_expected(expected_raw)
            if not ok:
                continue
            yield path.rsplit("/", 1)[-1], _junescape_simple(expr_raw), expected
