#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs each registered query's PySpark impl and DuckDB oracle at sf0.01
and compares: column-name set, row count, and an order-insensitive
canonical-value multiset (stricter than a hash — shows the first
diffing row). Queries without an oracle get a rows-only check.

Usage: python tools/check.py [query ...]   # no args = all
       python tools/check.py --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from builder_spark.canon import canon_rows, fetch_duckdb, fetch_spark  # noqa: E402
from builder_spark.catalog import TABLES  # noqa: E402
from builder_spark.registry import load_all  # noqa: E402
from builder_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    spark = get_spark("builder-spark-check")
    registry = load_all()
    names = args.names or list(registry)
    n_pass = n_fail = 0
    for name in names:
        q = registry[name]
        try:
            sdf = q.fn(spark, args.sf)
            s_cols, s_rows = fetch_spark(sdf)
        except Exception:
            print(f"FAIL {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows)")
            n_pass += 1
            continue
        try:
            d_cols, d_rows = fetch_duckdb(con, q.oracle)
        except Exception:
            print(f"FAIL {name}: duckdb raised")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
            if cs != cd:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(cs, cd)) if a != b), len(cs) - 1
                )
                problems.append(
                    f"values differ at sorted-row {diff}:\n  spark={cs[diff]}\n  duck ={cd[diff]}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok   {name}: {len(s_rows)} rows hash-match")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail / {len(names)} checked")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
