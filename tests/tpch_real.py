"""Real TPC-H data via DuckDB's tpch extension (official dbgen).

``tpch.tiny`` in the reference's product tests IS TPC-H sf0.01, so
materializing dbgen(sf=0.01) to parquet lets the reference's .result
files act as true goldens for every nation/region/tiny_* testcase —
the engine's output is compared to what the reference itself printed.
dbgen output is deterministic, and the DuckDB relations come with the
spec's prefixed column names (n_nationkey, l_shipdate, ...), including
every column the synthetic fixtures omit (comments, phones, partsupp).
"""

from __future__ import annotations

import os

import duckdb

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part", "partsupp",
    "orders", "lineitem",
)


def build_tpch_real_dir(out_dir: str, sf: float = 0.01) -> str:
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        return out_dir
    con = duckdb.connect()
    con.execute("LOAD tpch")
    con.execute(f"CALL dbgen(sf={sf})")
    for name in TPCH_TABLES:
        con.execute(f"COPY {name} TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)")
    con.close()
    open(marker, "w").write("ok")
    return out_dir
