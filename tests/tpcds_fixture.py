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
    """Materialize dsdgen(sf) to one parquet per table; idempotent."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        return out_dir
    con = duckdb.connect()
    con.execute("LOAD tpcds")
    con.execute(f"CALL dsdgen(sf={sf})")
    for name in TPCDS_TABLES:
        con.execute(
            f"COPY {name} TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    open(marker, "w").write("ok")
    return out_dir
