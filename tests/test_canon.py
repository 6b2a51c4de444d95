"""Unit tests for the driver-faithful canonicalizer — it is the lens
every differential check looks through, so its equivalences are pinned
here: numpy scalars == Python scalars, int is NOT float, NaN/NaT/None
all read as missing, midnight datetimes == dates."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd

from builder_spark.canon import canon_rows, canon_val


def test_numpy_and_python_scalars_agree():
    assert canon_val(np.int64(7)) == canon_val(7)
    assert canon_val(np.float64(1.5)) == canon_val(1.5)
    assert canon_val(np.bool_(True)) == canon_val(True)


def test_int_float_distinguished():
    # the driver hash mismatch class: DuckDB HUGEINT→float64 vs int64
    assert canon_val(123) != canon_val(123.0)


def test_missing_forms_conflate():
    assert canon_val(None) == canon_val(float("nan")) == canon_val(pd.NaT) == "∅"


def test_midnight_timestamp_equals_date():
    d = datetime.date(2024, 1, 2)
    assert canon_val(pd.Timestamp("2024-01-02 00:00:00")) == canon_val(d)
    assert canon_val(pd.Timestamp("2024-01-02 00:00:01")) != canon_val(d)


def test_bool_not_int():
    assert canon_val(True) != canon_val(1)


def test_rows_order_insensitive_and_column_sorted():
    a = canon_rows(["b", "a"], [(1, "x"), (2, "y")])
    b = canon_rows(["a", "b"], [("y", 2), ("x", 1)])
    assert a == b
