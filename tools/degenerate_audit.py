#!/usr/bin/env python
"""Standing degenerate-input audit (round-12, VERDICT r11 task 3).

Commit 035a898 guarded every degenerate-input denominator the round-11
queries had — found BY HAND. This tool generalizes that sweep the way
negzero_audit generalized the signed-zero fix: it materializes two
degenerate fixtures from the sf0.001 tables —

- ``empty``:  every table sliced to 0 rows (schema preserved)
- ``single``: every table sliced to its first row (joins mostly miss,
  groups collapse to one, variances are 0/NULL — the divide-by-zero
  and NULL-vs-NaN minefield)

— then runs EVERY registered query on BOTH engines against each
fixture and flags:

- either engine raising (ANSI DIVIDE_BY_ZERO / ARITHMETIC_OVERFLOW /
  sequence-descent errors only surface on degenerate slices),
- column-set, row-count, or canonical-value divergence (the same
  strict canon the driver hashes).

Rows-only queries (no oracle) get a Spark-must-not-raise check.
Exit 0 = zero findings (the pinned state); 1 otherwise.

Usage: python tools/degenerate_audit.py [query ...] [--fixture empty|single|both]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from builder_spark.canon import canon_rows, fetch_duckdb, fetch_spark  # noqa: E402
from builder_spark.catalog import TABLES  # noqa: E402
from builder_spark.registry import load_all  # noqa: E402
from builder_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.001"
FIXTURE_ROOT = "/tmp/builder_spark_degenerate"


def build_fixture(kind: str) -> str:
    """Materialize the 0-row / 1-row parquet slice set; return its dir."""
    dest = os.path.join(FIXTURE_ROOT, kind)
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        out = os.path.join(dest, f"{t}.parquet")
        tbl = pq.read_table(os.path.join(BASE_SF, f"{t}.parquet"))
        n = 0 if kind == "empty" else min(1, tbl.num_rows)
        pq.write_table(tbl.slice(0, n), out)
    return dest


def audit(names=None, fixtures=("empty", "single"), spark=None):
    """Return list of (fixture, query, kind, detail) findings."""
    if spark is None:
        spark = get_spark("builder-spark-degenerate-audit")
    registry = load_all()
    findings = []
    for kind in fixtures:
        sf_dir = build_fixture(kind)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names or list(registry):
            q = registry[name]
            try:
                s_cols, s_rows = fetch_spark(q.fn(spark, sf_dir))
            except Exception:
                findings.append(
                    (kind, name, "spark_raise",
                     traceback.format_exc().strip().splitlines()[-1])
                )
                continue
            if q.oracle is None:
                continue  # rows-only: ran without raising, that's the check
            try:
                d_cols, d_rows = fetch_duckdb(con, q.oracle)
            except Exception:
                findings.append(
                    (kind, name, "duck_raise",
                     traceback.format_exc().strip().splitlines()[-1])
                )
                continue
            if sorted(s_cols) != sorted(d_cols):
                findings.append(
                    (kind, name, "cols",
                     f"spark={sorted(s_cols)} duck={sorted(d_cols)}")
                )
                continue
            if len(s_rows) != len(d_rows):
                findings.append(
                    (kind, name, "rowcount",
                     f"spark={len(s_rows)} duck={len(d_rows)}")
                )
                continue
            cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
            if cs != cd:
                i = next(
                    (i for i, (a, b) in enumerate(zip(cs, cd)) if a != b),
                    len(cs) - 1,
                )
                findings.append(
                    (kind, name, "values",
                     f"row {i}: spark={cs[i]} duck={cd[i]}")
                )
        con.close()
    return findings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--fixture", default="both",
                    choices=["empty", "single", "both"])
    args = ap.parse_args()
    fixtures = ("empty", "single") if args.fixture == "both" else (args.fixture,)
    findings = audit(args.names or None, fixtures)
    for kind, name, fcls, detail in findings:
        print(f"DEGEN[{kind}] {name} ({fcls}): {detail}")
    print(f"{len(findings)} finding(s)")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
