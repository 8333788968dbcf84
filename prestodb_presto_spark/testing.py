"""Differential-testing utilities (the reference's H2QueryRunner pattern —
presto-tests/.../H2QueryRunner.java:88, QueryAssertions.java:75 — with
DuckDB as the oracle).
"""

from __future__ import annotations

import math

import duckdb

from prestodb_presto_spark.engine import TABLES


def norm_cell(v):
    """Normalize one cell for order-insensitive, precision-aware compare."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        if v == 0:
            return ("f", 0.0)
        # 9 significant digits — tolerant of last-ulp noise, strict otherwise
        return ("f", round(v, 9 - 1 - int(math.floor(math.log10(abs(v))))) if abs(v) > 1e-300 else 0.0)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm_cell(x) for x in v))
    if v is None:
        return ("n",)
    return ("s", str(v))


def norm_rows(cols, rows):
    """Sort columns by name, then rows — orderless multiset compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def duckdb_oracle(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with every fixture table registered as a view."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con


def compare(sdf, con, oracle_sql: str) -> str | None:
    """Run Spark DF + oracle SQL, compare; returns None or error string."""
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(oracle_sql)
    ocols = [d[0].lower() for d in res.description]
    orows = res.fetchall()
    if sorted(scols) != sorted(ocols):
        return f"columns {scols} vs {ocols}"
    if len(srows) != len(orows):
        return f"rowcount {len(srows)} vs {len(orows)}"
    a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return f"value mismatch, e.g. {diff}"
    return None


def compare_positional(sdf, con, oracle_sql: str) -> str | None:
    """Like ``compare`` but matches columns by POSITION, not name — for
    verbatim third-party SQL whose auto-generated output names differ
    across engines (Spark `count(1)` vs DuckDB `count_star()`)."""
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(oracle_sql)
    orows = res.fetchall()
    if len(sdf.columns) != len(res.description):
        return f"column count {len(sdf.columns)} vs {len(res.description)}"
    if len(srows) != len(orows):
        return f"rowcount {len(srows)} vs {len(orows)}"
    a = sorted(tuple(norm_cell(v) for v in r) for r in srows)
    b = sorted(tuple(norm_cell(v) for v in r) for r in orows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return f"value mismatch, e.g. {diff}"
    return None
