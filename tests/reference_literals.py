"""Scraper for the reference's scalar-function unit tests.

Extracts ``assertFunction`` / ``assertDecimalFunction`` statements
(multi-line, with Java "…" + "…" string concatenations joined) from
presto-main's scalar and type-operator Test*.java, TestExpressionCompiler's
``assertExecute``/``assertFilter``, and the presto-teradata-functions and
LIKE suites (all read from the read-only checkout at test time, never
copied).  Parseable expectations: scalar Java literals, ImmutableList/
asList/ImmutableMap collections, and decimal("..") digit strings.
Constructed objects (SqlTimestamp, sqlTimestampOf, ...) are out of
scope — the differential gate and function unit tests cover those.
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
        try:
            return True, dict(zip(items[0::2], items[1::2]))
        except TypeError:  # unhashable key (list-valued) — out of scope
            return False, None
    return False, None


def _scan_java_call(src: str, open_idx: int) -> int | None:
    """Index of the ')' closing the call whose '(' is at open_idx,
    skipping Java string/char literals."""
    i, depth, n = open_idx, 0, len(src)
    while i < n:
        c = src[i]
        if c in ('"', "'"):
            q = c
            i += 1
            while i < n and src[i] != q:
                if src[i] == "\\":
                    i += 1
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return None


_ASSERT_START = re.compile(r"\bassert(Function|DecimalFunction)\s*\(")
_JOIN_CONCAT = re.compile(r'"\s*\+\s*"', re.DOTALL)
_LEAD_STR = re.compile(r'^\s*"((?:[^"\\]|\\.)*)"\s*,\s*(.*)$', re.DOTALL)


def scrape(files: list[str] | None = None):
    """Yield (file, expr_sql, expected) for parseable cases."""
    paths = files or sorted(
        glob.glob(f"{REF_TEST_DIR}/Test*.java")
        + glob.glob(f"{REF_TYPE_TEST_DIR}/Test*.java")
        + glob.glob(REF_EXPR_COMPILER)
        + glob.glob(
            "/root/reference/presto-teradata-functions/src/test/java/com"
            "/facebook/presto/teradata/functions/Test*.java"
        )
        + glob.glob(
            "/root/reference/presto-main/src/test/java/com/facebook"
            "/presto/sql/TestLikeFunctions.java"
        )
    )
    for path in paths:
        fname = path.rsplit("/", 1)[-1]
        src = open(path).read()
        if fname == "TestExpressionCompiler.java":
            # single-line idioms: assertExecute / assertFilter
            for line in src.splitlines():
                fm = _FILTER_CASE.search(line)
                if fm:
                    # a filter DROPS the row on NULL (FilterAndProject
                    # semantics) — assertFilter expects false for NULL
                    # predicates; compare the kept/dropped outcome
                    yield (
                        fname,
                        "COALESCE((" + _junescape_simple(fm.group(1)) + "), FALSE)",
                        fm.group(2) == "true",
                    )
                    continue
                m = _EXEC_CASE.search(line)
                if not m:
                    continue
                ok, expected = parse_expected(m.group(3))
                if ok:
                    yield fname, _junescape_simple(m.group(1)), expected
            continue
        # statement-based scan: multi-line calls with "…" + "…" string
        # concatenation are joined before parsing
        for m in _ASSERT_START.finditer(src):
            open_idx = m.end() - 1
            close = _scan_java_call(src, open_idx)
            if close is None:
                continue
            # try { assertFunction(...); fail(); } wraps assertions the
            # reference EXPECTS to throw — skip, not value assertions
            tail = src[close + 1 :].lstrip()
            if tail.startswith(";"):
                tail = tail[1:].lstrip()
            if tail.startswith("fail("):
                continue
            arg_text = _JOIN_CONCAT.sub("", src[open_idx + 1 : close])
            lm = _LEAD_STR.match(arg_text)
            if not lm:
                continue
            expr_raw, rest = lm.group(1), lm.group(2).strip()
            if m.group(1) == "DecimalFunction":
                dm = re.fullmatch(r'decimal\("([^"]*)"\)', rest, re.DOTALL)
                if dm:
                    yield (
                        fname,
                        _junescape_simple(expr_raw),
                        ("__decimal__", dm.group(1)),
                    )
                continue
            parts = _split_top_args(rest)
            if parts is None or len(parts) < 2:
                continue
            expected_raw = ",".join(parts[1:]).strip()
            ok, expected = parse_expected(expected_raw)
            if not ok:
                continue
            yield fname, _junescape_simple(expr_raw), expected
