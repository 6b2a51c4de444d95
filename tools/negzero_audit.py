#!/usr/bin/env python
"""Standing signed-zero audit (round-11, VERDICT r10 task 2).

CORRECTNESS_r10 proved the driver's pandas value hash is bit-pattern
sensitive: DuckDB ``round()`` preserves IEEE signed zero and can emit
-0.0 (bits 0x8000000000000000) where Spark's BigDecimal-backed ``round``
can only emit +0.0 — equal values, different bits, hash fail
(q_zscore_normalize, r10). The oracle-side discipline is ``round(...)
+ 0.0`` on any rounded float that can be mathematically zero (SURVEY §2
DuckDB-parity trap 10).

This tool runs EVERY registered query on BOTH engines and flags any
output cell carrying negative-zero bits, on either side. Any hit is a
latent driver-hash failure: a -0.0 on one engine only fails outright;
a -0.0 on both sides is one dust-sign flip away from failing.

Usage: python tools/negzero_audit.py [query ...] [--sf DIR]
Exit 0 = zero carriers (the pinned state); 1 = carriers found.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from builder_spark.canon import (  # noqa: E402
    fetch_duckdb,
    fetch_spark,
    scan_neg_zero,
)
from builder_spark.catalog import TABLES  # noqa: E402
from builder_spark.registry import load_all  # noqa: E402
from builder_spark.session import get_spark  # noqa: E402


def audit(names=None, sf_dir="/root/testdata/sf0.01", spark=None, con=None):
    """Return list of (query, engine, column, count) carriers."""
    if con is None:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    if spark is None:
        spark = get_spark("builder-spark-negzero-audit")
    registry = load_all()
    carriers = []
    for name in names or list(registry):
        q = registry[name]
        s_cols, s_rows = fetch_spark(q.fn(spark, sf_dir))
        for col, n in sorted(scan_neg_zero(s_cols, s_rows).items()):
            carriers.append((name, "spark", col, n))
        if q.oracle is not None:
            d_cols, d_rows = fetch_duckdb(con, q.oracle)
            for col, n in sorted(scan_neg_zero(d_cols, d_rows).items()):
                carriers.append((name, "duckdb", col, n))
    return carriers


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    carriers = audit(args.names or None, args.sf)
    for name, engine, col, n in carriers:
        print(f"NEGZERO {name} [{engine}] column={col} cells={n}")
    print(f"{len(carriers)} carrier column(s) found")
    return 1 if carriers else 0


if __name__ == "__main__":
    sys.exit(main())
