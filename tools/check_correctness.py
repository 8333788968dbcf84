#!/usr/bin/env python3
"""Local replica of the driver's differential gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, schema shape, and
an order-insensitive value hash (floats rounded to 9 significant digits).

Usage:
    python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from prestodb_presto_spark.testing import compare, duckdb_oracle


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from prestodb_presto_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = duckdb_oracle(sf_dir)

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = len(sdf.collect())
                print(f"WEAK {name}: rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                n_weak += 1
                continue
            err = compare(sdf, con, oracles[name])
        except Exception as ex:
            print(f"FAIL {name}: error: {str(ex)[:300]}")
            n_fail += 1
            continue
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n== {n_pass} pass, {n_weak} rows-only, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
