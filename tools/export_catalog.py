#!/usr/bin/env python3
"""Regenerate CATALOG.md — one row per differential-gate query."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prestodb_presto_spark.queries import load_all


def main() -> None:
    specs = load_all()
    lines = [
        "# CATALOG — differential query inventory",
        "",
        f"{len(specs)} queries; every entry runs via `__spark_entry__.queries()` "
        "and (unless marked rows-only) hash-compares against its DuckDB oracle. "
        "Regenerate with `python tools/export_catalog.py`.",
        "",
        "| query | tags | oracle | summary |",
        "|---|---|---|---|",
    ]
    for name in sorted(specs):
        s = specs[name]
        summary = (s.doc or "").strip().splitlines()[0].rstrip(".") if s.doc else ""
        oracle = "duckdb" if s.oracle else "rows-only"
        lines.append(f"| `{name}` | {', '.join(s.tags)} | {oracle} | {summary} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(specs)} queries")


if __name__ == "__main__":
    main()
