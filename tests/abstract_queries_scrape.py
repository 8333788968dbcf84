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


# ---------------------------------------------------------------------------
# Oracle compat: the reference's expected SQL targets H2
# (H2QueryRunner.java); DuckDB is the stand-in oracle here and differs
# from H2 in a handful of purely syntactic ways.  These rewrites
# translate the ORACLE side only — the engine under test always gets the
# reference's original Presto SQL.

_VALUES_STOP = re.compile(
    r"(?i)^(ORDER|LIMIT|UNION|EXCEPT|INTERSECT|OFFSET|FETCH)\b"
)
_VALUES_KW = re.compile(r"(?i)VALUES\b")


def _wrap_values_rows(sql: str) -> str:
    """H2 accepts bare scalar VALUES rows (``VALUES 1, 2`` — also inside
    subqueries); DuckDB requires each row parenthesized."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = sql.find("'", i + 1)
            j = j if j != -1 else n - 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        m = _VALUES_KW.match(sql, i)
        if m and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
            items, end = _values_items(sql, m.end())
            wrapped = [
                it if it.strip().startswith("(") else f"({it.strip()})"
                for it in (_wrap_values_rows(s) for s in items)
            ]
            clause = "VALUES " + ", ".join(w.strip() for w in wrapped)
            # H2 allows FROM VALUES ... unparenthesized; DuckDB doesn't
            if re.search(r"(?i)\bFROM\s*$", "".join(out)):
                clause = f"({clause})"
            out.append(clause)
            i = end
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _values_items(sql: str, start: int) -> tuple[list[str], int]:
    """Comma-split a VALUES body from ``start`` at depth 0, stopping at
    the enclosing ``)``, a depth-0 trailing clause keyword, or the end."""
    items: list[str] = []
    buf: list[str] = []
    depth = 0
    i, n = start, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = sql.find("'", i + 1)
            j = j if j != -1 else n - 1
            buf.append(sql[i : j + 1])
            i = j + 1
            continue
        if depth == 0:
            if ch == ")":
                break
            if ch.isalpha() and _VALUES_STOP.match(sql, i):
                break
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
    return items, i


_DATEADD = re.compile(
    r"(?i)\bDATEADD\s*\(\s*'(\w+)'\s*,\s*([^(),]+?)\s*,\s*([^()]+?)\s*\)"
)


# Hand translations (round-6) for the handful of statements whose
# H2-lax SQL DuckDB rejects outright — each keyed by the
# whitespace-normalized original, each a semantically identical
# DuckDB-runnable equivalent (reviewed case by case):
#   - `key` / TIME / TIMESTAMP / DATE / INTERVAL as identifiers → quoted
#   - uncorrelated IN-subquery in GROUP BY / scalar subquery in LEFT
#     JOIN ON → precomputed in a derived-table projection
#   - H2's ungrouped-but-single-row-group partkey → added to GROUP BY
#     ((orderkey, linenumber) is the lineitem PK, so the group grain is
#     one row and the added key changes nothing)
#   - H2 row-rendered arrays in VALUES → DuckDB list literals
_HAND_TRANSLATIONS = {
    " ".join(k.split()): v
    for k, v in {
        "SELECT key + 5, status FROM (SELECT orderkey key, orderstatus"
        " status FROM orders UNION ALL SELECT orderkey key, linestatus"
        " status FROM lineitem)":
            'SELECT "key" + 5, status FROM (SELECT orderkey AS "key",'
            " orderstatus AS status FROM orders UNION ALL SELECT orderkey,"
            " linestatus FROM lineitem) t",
        "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM"
        " orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, 6 IN"
        " (SELECT orderkey FROM orders WHERE orderkey < 7)HAVING 6 IN"
        " (SELECT orderkey FROM orders WHERE orderkey < 7)":
            "SELECT linenumber, min(orderkey), __c FROM lineitem CROSS JOIN"
            " (SELECT count(*) > 0 AS __c FROM orders WHERE orderkey = 6"
            " AND orderkey < 7) x GROUP BY linenumber, __c HAVING __c",
        "SELECT o1.orderkey, COUNT(*) FROM (SELECT * FROM orders ORDER BY"
        " orderkey LIMIT 5) o1 LEFT JOIN (SELECT * FROM orders ORDER BY"
        " orderkey LIMIT 10) o2 ON o1.orderkey BETWEEN (SELECT"
        " avg(orderkey) FROM orders) - 10 AND (SELECT avg(orderkey) FROM"
        " orders) + 10 GROUP BY o1.orderkey":
            "SELECT o1.orderkey, COUNT(*) FROM (SELECT o.*, (SELECT"
            " avg(orderkey) FROM orders) AS __av FROM (SELECT * FROM orders"
            " ORDER BY orderkey LIMIT 5) o) o1 LEFT JOIN (SELECT * FROM"
            " orders ORDER BY orderkey LIMIT 10) o2 ON o1.orderkey BETWEEN"
            " o1.__av - 10 AND o1.__av + 10 GROUP BY o1.orderkey",
        "SELECT TIME, TIMESTAMP, DATE, INTERVAL FROM (SELECT 1 TIME, 2"
        " TIMESTAMP, 3 DATE, 4 INTERVAL)":
            'SELECT "TIME", "TIMESTAMP", "DATE", "INTERVAL" FROM (SELECT'
            ' 1 AS "TIME", 2 AS "TIMESTAMP", 3 AS "DATE", 4 AS "INTERVAL") t',
        "VALUES (NULL, NULL , ('F', 'O', 'O')),('5-LOW', NULL , ('F',"
        " 'O')),('1-URGENT', NULL , ('O')),('5-LOW', 370 , NULL),('5-LOW',"
        " 1234, ('F')),('5-LOW', 1369, ('O')),('5-LOW', 445 ,"
        " NULL),('1-URGENT', 781 , ('O'))":
            "SELECT * FROM (VALUES (NULL, NULL, ['F','O','O']), ('5-LOW',"
            " NULL, ['F','O']), ('1-URGENT', NULL, ['O']), ('5-LOW', 370,"
            " NULL), ('5-LOW', 1234, ['F']), ('5-LOW', 1369, ['O']),"
            " ('5-LOW', 445, NULL), ('1-URGENT', 781, ['O'])) t(a, b, c)",
    }.items()
}


def oracle_compat(osql: str) -> str:
    """Translate the reference's H2-dialect expected SQL to DuckDB."""
    hand = _HAND_TRANSLATIONS.get(" ".join(osql.split()))
    if hand is not None:
        return hand
    # the GroupingCombinations H2 goldens select partkey ungrouped in
    # their first UNION branch; (orderkey, linenumber) is the lineitem
    # PK, so adding partkey to that GROUP BY is value-identical
    if "GROUP BY orderkey, suppkey, linenumber UNION ALL" in osql:
        osql = osql.replace(
            "GROUP BY orderkey, suppkey, linenumber UNION ALL",
            "GROUP BY orderkey, partkey, suppkey, linenumber UNION ALL",
            1,
        )
    s = _wrap_values_rows(osql)
    # H2 rand() is DuckDB random(); values are only compared through
    # always-true/false predicates in the suite
    s = re.sub(r"(?i)\brand\s*\(", "random(", s)
    # H2 DATEADD('DAY', n, x) → interval arithmetic
    s = _DATEADD.sub(r"(\3 + (\2) * INTERVAL '1' \1)", s)
    # SELECT * with no FROM (empty-result idiom)
    s = re.sub(r"(?i)^\s*SELECT\s+\*\s+WHERE\b", "SELECT 1 WHERE", s)
    # (query ORDER BY a) ORDER BY b — H2 allows the inner ORDER BY at
    # top level; DuckDB needs the parenthesized query as a derived table
    t = s.lstrip()
    if t.startswith("("):
        depth = 0
        for k, ch in enumerate(t):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    rest = t[k + 1 :].lstrip()
                    if re.match(r"(?i)^ORDER\s+BY\b", rest):
                        s = f"SELECT * FROM {t[: k + 1]} {rest}"
                    break
    return s


# retained name: the earliest compat rewrite, now part of oracle_compat
oracle_values_compat = oracle_compat


if __name__ == "__main__":
    from collections import Counter

    c = Counter((f, kind) for f, _m, _k, kind, _a, _e in scrape())
    total = sum(c.values())
    print(dict(c), "total:", total)
