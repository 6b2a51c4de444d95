"""Standing sf0.1 strict-canon differential gate (round-12, VERDICT
r11 task 2).

sf0.1 is the bench scale — the one scale where values were never
hash-checked until round 12. The first full sweep caught 11 REAL
scale-dependent divergences that sf0.01 could not show: an int64
overflow past double's 2^53 (q_power_analysis), a DuckDB ln(0) raise
on sub-second gaps (q_weibull_fit), five new −0.0 carriers, two
rounding-boundary collisions from engine-internal summation order
(q_cdc_upsert, q_burstiness), and the q_geo_nearest double-cause
(Spark DECIMAL literal + libm trig drift). This battery pins that
class shut the way test_degenerate_audit pins the empty-input class:

- the REGRESSION SET (the 11 once-failing queries) hash-checks at
  sf0.1 on every CI pass;
- the FULL surface sweep runs when SPARK_GRAFT_SF01_GATE=1 (the
  per-round close-out gate; ~40 min of Spark time).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from builder_spark.canon import canon_rows, fetch_duckdb, fetch_spark
from builder_spark.catalog import TABLES
from builder_spark.registry import load_all

SF01 = "/root/testdata/sf0.1"

#: every query the round-12 sf0.1 sweep caught — the scale-divergence
#: regression set. A new failure here means a refactor re-opened the
#: class; run `python tools/check.py --sf /root/testdata/sf0.1` to see
#: the first diffing canonical row.
REGRESSION_SET = sorted(
    [
        "q_array_funcs",
        "q_array_hof",
        "q_burstiness",
        "q_cdc_upsert",
        "q_dim_variance",
        "q_embedding_anisotropy",
        "q_geo_nearest",
        "q_power_analysis",
        "q_theil_index",
        "q_weibull_fit",
    ]
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')"
        )
    yield con
    con.close()


def _names():
    reg = load_all()
    if os.environ.get("SPARK_GRAFT_SF01_GATE"):
        return [n for n, q in reg.items() if q.oracle is not None]
    return REGRESSION_SET


@pytest.mark.parametrize("name", _names())
def test_sf01_hash_match(spark, duck, name):
    q = load_all()[name]
    s_cols, s_rows = fetch_spark(q.fn(spark, SF01))
    d_cols, d_rows = fetch_duckdb(duck, q.oracle)
    assert sorted(s_cols) == sorted(d_cols), name
    assert len(s_rows) == len(d_rows), name
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    bad = next((i for i, (a, b) in enumerate(zip(cs, cd)) if a != b), None)
    assert bad is None, f"{name}: sorted-row {bad}\n  spark={cs[bad]}\n  duck ={cd[bad]}"
