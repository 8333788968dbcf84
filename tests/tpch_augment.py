"""Derive the TPC-H columns/tables the synthetic fixtures omit.

The driver's parquet fixtures (FIXTURES.md) carry a trimmed TPC-H
schema — no partsupp, no comment/address/phone/shipmode/commitdate
columns.  The reference's own hive_tpch corpus queries
(presto-product-tests/.../hive_tpch/q*.sql) need the full spec, so this
helper materializes ENRICHED copies: every original column and row kept
bit-for-bit, plus deterministic dbgen-flavored derivations (TPC-H spec
§4.2: o_shippriority is the constant 0, p_mfgr is
'Manufacturer#'||(1..5), partsupp spreads each part over 4 suppliers
with the dbgen supplier-skip formula).  Both engines then read the SAME
parquet files, so the corpus comparison stays a pure engine-vs-engine
differential — the derivations cannot drift between Spark and DuckDB
because neither computes them.

Values that dbgen draws randomly (availqty, supplycost, comments,
phones) use key-modulus formulas instead — deterministic, and shaped so
the corpus predicates stay selective, not degenerate: ~2% of o_comment
match q13's '%special%requests%', ~5% of s_comment match q16's
'%Customer%Complaints%', every l_shipmode/l_shipinstruct/p_container
domain value appears.
"""

from __future__ import annotations

import os

import duckdb

SHIPMODES = "['REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB']"
SHIPINSTRUCT = "['DELIVER IN PERSON','COLLECT COD','NONE','TAKE BACK RETURN']"
CONTAINER1 = "['SM','LG','MED','JUMBO','WRAP']"
CONTAINER2 = "['CASE','BOX','BAG','JAR','PKG','PACK','CAN','DRUM']"

_DERIVED = {
    "nation": """
        *,
        'nation comment ' || CAST(n_nationkey AS VARCHAR) AS n_comment
    """,
    "customer": """
        *,
        CAST(10 + c_custkey % 25 AS VARCHAR) || '-989-741-' ||
            lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS c_phone,
        'address c' || CAST(c_custkey AS VARCHAR) AS c_address,
        'customer comment ' || CAST(c_custkey AS VARCHAR) AS c_comment
    """,
    "orders": """
        *,
        0 AS o_shippriority,
        CASE WHEN o_orderkey % 50 = 0
             THEN 'handle with special requests quickly'
             ELSE 'quiet regular account deposits' END AS o_comment
    """,
    "lineitem": f"""
        *,
        {SHIPMODES}[1 + (l_orderkey * 7 + l_linenumber) % 7] AS l_shipmode,
        {SHIPINSTRUCT}[1 + (l_orderkey + l_linenumber * 3) % 4] AS l_shipinstruct,
        l_shipdate + ((l_orderkey % 61) - 30) * INTERVAL '1 day' AS l_commitdate,
        l_shipdate + (1 + (l_orderkey * 3 + l_linenumber) % 30) * INTERVAL '1 day'
            AS l_receiptdate
    """,
    "part": f"""
        *,
        'Manufacturer#' || CAST(1 + p_partkey % 5 AS VARCHAR) AS p_mfgr,
        {CONTAINER1}[1 + p_partkey % 5] || ' ' ||
            {CONTAINER2}[1 + (p_partkey // 5) % 8] AS p_container
    """,
    "supplier": """
        *,
        'supplier address ' || CAST(s_suppkey AS VARCHAR) AS s_address,
        CAST(10 + s_suppkey % 25 AS VARCHAR) || '-393-474-' ||
            lpad(CAST(s_suppkey % 10000 AS VARCHAR), 4, '0') AS s_phone,
        CASE WHEN s_suppkey % 20 = 0
             THEN 'sleepy Customer pending Complaints filed'
             ELSE 'instructions sleep furiously' END AS s_comment
    """,
}

# dbgen (TPC-H spec §4.2.3): part p is stocked by suppliers
# ((p + i*(S/4 + (p-1)/S)) % S) + 1 for i in 0..3
_PARTSUPP = """
    SELECT
        p.p_partkey AS ps_partkey,
        CAST(((p.p_partkey + i.i * (s.cnt // 4 + (p.p_partkey - 1) // s.cnt))
              % s.cnt) + 1 AS BIGINT) AS ps_suppkey,
        CAST(1 + (p.p_partkey * 17 + i.i * 13) % 9999 AS INTEGER) AS ps_availqty,
        CAST(1 + (p.p_partkey * 31 + i.i * 7) % 99900 AS DOUBLE) / 100
            AS ps_supplycost,
        'partsupp comment ' || CAST(p.p_partkey AS VARCHAR) AS ps_comment
    FROM part p
    CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) i
    CROSS JOIN (SELECT count(*) AS cnt FROM supplier) s
"""


def build_augmented_dir(sf_dir: str, out_dir: str) -> str:
    """Materialize enriched parquet under out_dir; idempotent."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        return out_dir
    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    for name, proj in _DERIVED.items():
        con.execute(
            f"COPY (SELECT {proj} FROM {name}) TO '{out_dir}/{name}.parquet'"
            " (FORMAT PARQUET)"
        )
    con.execute(
        f"COPY ({_PARTSUPP}) TO '{out_dir}/partsupp.parquet' (FORMAT PARQUET)"
    )
    con.close()
    open(marker, "w").write("ok")
    return out_dir
