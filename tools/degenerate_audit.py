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
    """Materialize a degenerate parquet slice set; return its dir.

    Kinds:
    - ``empty`` / ``single``: every table sliced to 0 / 1 rows.
    - ``single_purchase``: like ``single`` but events keeps exactly ONE
      purchase row — q_ewma_chart's daily table then has one day and
      its sample-variance denominator (n-1) is 0 (r14 ADVICE: the
      plain 1-row events fixture has no purchase row, so the unguarded
      path was never exercised).
    - ``rdd_flat_band``: like ``single`` but orders keeps 3 rows whose
      o_totalprice is forced to one constant inside q_rdd_sharp's
      ±100k band (sxx == 0) and lineitem keeps those orders' lines —
      exercising the slope/variance divisions on a degenerate side.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    dest = os.path.join(FIXTURE_ROOT, kind)
    os.makedirs(dest, exist_ok=True)
    keep_keys = None
    if kind == "rdd_flat_band":
        li = pq.read_table(os.path.join(BASE_SF, "lineitem.parquet"), columns=["l_orderkey"])
        keys = sorted(set(li["l_orderkey"].to_pylist()))[:3]
        keep_keys = pa.array(keys)
    for t in TABLES:
        out = os.path.join(dest, f"{t}.parquet")
        tbl = pq.read_table(os.path.join(BASE_SF, f"{t}.parquet"))
        if kind == "empty":
            sliced = tbl.slice(0, 0)
        elif kind == "single_purchase" and t == "events":
            sliced = tbl.filter(pc.equal(tbl["event_type"], "purchase")).slice(0, 1)
        elif kind == "rdd_flat_band" and t == "orders":
            sub = tbl.filter(pc.is_in(tbl["o_orderkey"], value_set=keep_keys))
            i = sub.schema.get_field_index("o_totalprice")
            flat = pa.array([250500.0] * sub.num_rows, type=sub.schema.field(i).type)
            sliced = sub.set_column(i, sub.schema.field(i), flat)
        elif kind == "rdd_flat_band" and t == "lineitem":
            sliced = tbl.filter(pc.is_in(tbl["l_orderkey"], value_set=keep_keys))
        else:
            sliced = tbl.slice(0, min(1, tbl.num_rows))
        pq.write_table(sliced, out)
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
