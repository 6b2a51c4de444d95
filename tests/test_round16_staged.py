"""Round-16 STAGED operators: oracle-gated before registration.

The graded surface is frozen at 671 until CORRECTNESS_r15 lands
(r14 verdict task 1); these staged layout operators must already pass
the exact strict-canon comparison tools/check.py will run once they
register in r16 — and must be INVISIBLE to the graded registry until
then."""

from __future__ import annotations

import duckdb
import pytest

from builder_spark.canon import canon_rows, fetch_duckdb, fetch_spark
from builder_spark.catalog import TABLES
from builder_spark.staging.round16_staged import STAGED_ORACLES, STAGED_QUERIES

SF = "/root/testdata/sf0.01"


def test_staged_surface_is_invisible_to_the_graded_registry():
    """Freeze guard: importing the staged module must not change the
    graded surface — 671 exactly, none of the staged names present."""
    from builder_spark.registry import load_all

    reg = load_all()
    assert len(reg) == 671
    assert not set(STAGED_QUERIES) & set(reg)
    from builder_spark.queries import MODULES

    assert "builder_spark.queries.round16_staged" not in MODULES


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    s_cols, s_rows = fetch_spark(STAGED_QUERIES[name](spark, SF))
    d_cols, d_rows = fetch_duckdb(con, STAGED_ORACLES[name])
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert canon_rows(s_cols, s_rows) == canon_rows(d_cols, d_rows)
