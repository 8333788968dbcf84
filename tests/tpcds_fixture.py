"""Deterministic TPC-DS dataset for the reference's tpcds suite.

DuckDB ships the official dsdgen as its tpcds extension; sf0.01 is
deterministic (same rows on every run), so materializing it to parquet
gives both engines an identical bit-for-bit dataset — the same
shared-fixture pattern as tests/tpch_augment.py, but for the full
24-table TPC-DS schema the reference's tpcds testcases require.
"""

from __future__ import annotations

import os

import duckdb

TPCDS_TABLES = (
    "call_center", "catalog_page", "catalog_returns", "catalog_sales",
    "customer", "customer_address", "customer_demographics", "date_dim",
    "household_demographics", "income_band", "inventory", "item",
    "promotion", "reason", "ship_mode", "store", "store_returns",
    "store_sales", "time_dim", "warehouse", "web_page", "web_returns",
    "web_sales", "web_site",
)


def build_tpcds_dir(out_dir: str, sf: float = 0.01) -> str:
    """Materialize dsdgen(sf) to one parquet per table; idempotent.

    One deterministic augmentation (round 9): dsdgen at sf<=0.1 emits a
    SINGLE web_page row with wp_char_count=2531, so q90's predicate
    ``wp_char_count BETWEEN 5000 AND 5200`` matched nothing and the
    query's pm denominator was 0 — Presto itself would raise Division
    by zero on this data, leaving q90 the only reference rendering not
    exercised end-to-end.  Nudging that one row's wp_char_count to 5100
    (wp_char_count appears in NO other testcase — q90.sql is its sole
    reader) makes both halves of the ratio non-empty (am=77, pm=123 at
    sf0.01) without touching any other query's inputs.  Both engines
    read the same augmented parquet, so the differential stays exact."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, ".complete_v2")
    if os.path.exists(marker):
        return out_dir
    con = duckdb.connect()
    con.execute("LOAD tpcds")
    con.execute(f"CALL dsdgen(sf={sf})")
    con.execute("UPDATE web_page SET wp_char_count = 5100")
    for name in TPCDS_TABLES:
        con.execute(
            f"COPY {name} TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    open(marker, "w").write("ok")
    return out_dir
