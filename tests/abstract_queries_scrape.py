"""Scraper for the reference's end-to-end SQL suites.

presto-tests/src/main/java/com/facebook/presto/tests/AbstractTestQueries.java
(8096 lines, 505 @Test methods) and AbstractTestAggregations.java are the
reference's core correctness asset (SURVEY.md §5 layer 2): every SQL
feature exercised over the TPC-H ``tiny`` catalog and differentially
checked against H2 (H2QueryRunner.java:88, QueryAssertions.java:75).

This module scrapes their assertion statements from the read-only
checkout at test time — never copied — joining Java "…" + "…" string
concatenations, and yields runnable cases:

  - ``assertQuery("sql")``                → run BOTH engines on sql, orderless
  - ``assertQuery("actual", "expected")`` → Spark(actual) vs oracle(expected)
  - ``assertQueryOrdered(...)``           → same, order-sensitive compare
  - ``assertQueryReturnsEmptyResult(sql)``→ Spark returns zero rows

Statements built with format()/variables/Session overloads are out of
scope (they parameterize session toggles the Spark engine has no analog
for); the differential gate and the product-test suites cover those
shapes.
"""

from __future__ import annotations

import re

REF_TESTS_DIR = "/root/reference/presto-tests/src/main/java/com/facebook/presto/tests"

FILES = (
    "AbstractTestQueries.java",
    "AbstractTestAggregations.java",
    # index joins are a physical strategy in the reference; the queries
    # themselves are plain joins and must hold on any engine
    "AbstractTestIndexedQueries.java",
    "AbstractTestIntegrationSmokeTest.java",
)

_SQL_LIT = r'"((?:[^"\\]|\\.)*)"'
_PATTERNS = (
    ("plain", re.compile(rf"^assertQuery\(\s*{_SQL_LIT}\s*\)$")),
    ("plain", re.compile(rf"^assertQuery\(\s*{_SQL_LIT}\s*,\s*{_SQL_LIT}\s*\)$")),
    ("ordered", re.compile(rf"^assertQueryOrdered\(\s*{_SQL_LIT}\s*\)$")),
    ("ordered", re.compile(rf"^assertQueryOrdered\(\s*{_SQL_LIT}\s*,\s*{_SQL_LIT}\s*\)$")),
    ("empty", re.compile(rf"^assertQueryReturnsEmptyResult\(\s*{_SQL_LIT}\s*\)$")),
)

_METHOD = re.compile(r"public\s+void\s+(\w+)\s*\(")


def _junescape(s: str) -> str:
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
        elif nxt in "ntr0":
            out.append({"n": "\n", "t": "\t", "r": "\r", "0": "\0"}[nxt])
            i += 2
        else:
            out.append(nxt)
            i += 2
    return "".join(out).encode("utf-16", "surrogatepass").decode("utf-16")


def _statements(text: str):
    """Split Java source into ';'-terminated statements at paren depth 0,
    string-aware, tagging each with the enclosing test-method name."""
    lines = [l for l in text.splitlines() if not l.strip().startswith("//")]
    text = "\n".join(lines)
    method = "?"
    depth = 0
    buf: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == '"':
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == '"':
                    break
                j += 1
            buf.append(text[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == ";" and depth == 0:
            stmt = "".join(buf)
            m = _METHOD.search(stmt)
            if m:
                method = m.group(1)
            yield method, stmt
            buf = []
        else:
            buf.append(ch)
        i += 1


def scrape():
    """Yields (file, method, seq, kind, actual_sql, expected_sql_or_None)."""
    for fname in FILES:
        try:
            src = open(f"{REF_TESTS_DIR}/{fname}").read()
        except OSError:
            continue
        seq: dict[str, int] = {}
        for method, stmt in _statements(src):
            s = " ".join(stmt.split())
            s = re.sub(r'"\s*\+\s*"', "", s)  # join "…" + "…"
            m = re.search(r"(assert\w+\(.*)$", s)
            if not m:
                continue
            s = m.group(1)
            for kind, pat in _PATTERNS:
                hit = pat.match(s)
                if hit:
                    groups = hit.groups()
                    actual = _junescape(groups[0])
                    expected = _junescape(groups[1]) if len(groups) > 1 else None
                    k = seq.get(method, 0)
                    seq[method] = k + 1
                    yield fname, method, k, kind, actual, expected
                    break


def oracle_values_compat(osql: str) -> str:
    """H2 (the reference's oracle) accepts bare scalar VALUES rows
    (``VALUES 1, 2``); DuckDB requires each row parenthesized.  Wrap
    bare items so DuckDB can serve as the oracle for the reference's
    expected-SQL form."""
    s = osql.lstrip()
    if not s.upper().startswith("VALUES"):
        return osql
    body = s[6:]
    items: list[str] = []
    depth = 0
    buf: list[str] = []
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch == "'":
            j = body.find("'", i + 1)
            j = j if j != -1 else n - 1
            buf.append(body[i : j + 1])
            i = j + 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    items.append("".join(buf))
    wrapped = [
        it if it.strip().startswith("(") else f"({it.strip()})" for it in items
    ]
    return "VALUES " + ", ".join(wrapped)


if __name__ == "__main__":
    from collections import Counter

    c = Counter((f, kind) for f, _m, _k, kind, _a, _e in scrape())
    total = sum(c.values())
    print(dict(c), "total:", total)
