"""Presto-dialect SQL → Spark SQL translation (the "light shim" of
SURVEY.md §7).

Spark SQL accepts most of the reference grammar
(presto-parser/.../SqlBase.g4) verbatim: SELECT/joins/grouping sets/
windows/UNNEST-equivalents/set ops/CTEs/VALUES/TABLESAMPLE all parse.
What breaks is a short list of function-name collisions with different
semantics (SURVEY §7 risk #2) — exactly the names this module owns.
Everything else passes through untouched, so Catalyst sees a plain
Spark query and every optimization applies.

NOT a SQL parser: rewrites are token-aware regexes on names + literal
patterns, which covers the reference's documented signatures.  For
programmatic use the DataFrame registry (prestodb_presto_spark.functions)
is the first-class surface.
"""

from __future__ import annotations

import re

from prestodb_presto_spark.functions.datetime_fns import _mysql_to_java

# Presto name -> Spark name, signature-compatible 1:1 renames.
_RENAMES = {
    "arbitrary": "any_value",
    "approx_distinct": "approx_count_distinct",
    "json_extract_scalar": "get_json_object",
    "json_extract": "get_json_object",
    "strpos": "instr",
    "json_array_length": "json_array_length",  # same name (Spark 3.1+)
    "to_unixtime": "unix_timestamp",
    "from_unixtime": "timestamp_seconds",
    "json_parse": "",  # identity: Spark JSON fns take the string directly
    "json_format": "",
}

# date_add('unit', n, ts) / date_diff('unit', a, b) → Spark
# timestampadd/timestampdiff keep the argument order; only the quoted
# unit becomes a bare keyword.
_DATE_ADD = re.compile(r"\bdate_add\s*\(\s*'(\w+)'\s*,", re.IGNORECASE)
_DATE_DIFF = re.compile(r"\bdate_diff\s*\(\s*'(\w+)'\s*,", re.IGNORECASE)

# date_format(x, '%…') / date_parse(x, '%…'): translate the MySQL
# pattern literal to a Java pattern (DateTimeFunctions.java tokens).
# first arg may nest calls three levels deep and contain string
# literals, e.g. date_format(TIMESTAMP '2024-02-29 13:05:00', '%Y-%m')
_LIT = r"'(?:[^']|'')*'"
_ATOM = rf"(?:[^()']|{_LIT})"
_ARG = rf"(?:{_ATOM}|\((?:{_ATOM}|\((?:{_ATOM}|\({_ATOM}*\))*\))*\))*"
_DATE_FORMAT = re.compile(
    rf"\b(date_format|date_parse)\s*\(({_ARG}),\s*'([^']*)'\s*\)",
    re.IGNORECASE,
)


def _rename(sql: str, presto: str, spark: str) -> str:
    if spark == "":
        # drop the call, keep the argument: json_parse(x) -> (x)
        return re.sub(rf"\b{presto}\s*\(", "(", sql, flags=re.IGNORECASE)
    return re.sub(rf"\b{presto}\s*\(", f"{spark}(", sql, flags=re.IGNORECASE)


_STRING_LIT = re.compile(r"'(?:[^']|'')*'")


def translate(sql: str) -> str:
    """Presto-dialect SQL → Spark SQL."""
    # Mask string literals so owned names inside quotes are never
    # rewritten ('... strpos(' stays text).  The datetime-pattern rules
    # (_DATE_ADD/_DATE_FORMAT) intentionally run with literals visible —
    # they must read the quoted unit/pattern; masking happens after.
    out = _DATE_ADD.sub(lambda m: f"timestampadd({m.group(1).upper()},", sql)
    out = _DATE_DIFF.sub(lambda m: f"timestampdiff({m.group(1).upper()},", out)

    def _fmt(m: re.Match) -> str:
        fn, arg, pat = m.group(1).lower(), m.group(2), m.group(3)
        if "%" not in pat:
            return m.group(0)
        # _mysql_to_java single-quotes literal alpha chars ('T'); escape
        # them ('' inside a SQL literal) before re-wrapping in quotes.
        java = _mysql_to_java(pat).replace("'", "''")
        if fn == "date_parse":
            return f"to_timestamp({arg}, '{java}')"
        return f"date_format({arg}, '{java}')"

    out = _DATE_FORMAT.sub(_fmt, out)
    # mask literals, rewrite names, unmask
    literals: list[str] = []

    def _mask(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    out = _STRING_LIT.sub(_mask, out)
    # longest names first so json_extract_scalar wins over json_extract
    for presto in sorted(_RENAMES, key=len, reverse=True):
        out = _rename(out, presto, _RENAMES[presto])
    return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], out)
