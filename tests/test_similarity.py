"""Similarity-operator equivalence: the numpy blocked matmul path must
agree with the expression-based (oracle-graded) brute force — same
top-k sets, same similarities to float-reduction tolerance."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.operators.similarity import blocked_topk_pandas, brute_force_topk

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_blocked_topk_matches_brute_force(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    expr = {(r.q_id, r.rank): (r.vec_id, r.cos_sim) for r in brute_force_topk(q, e, k=5).collect()}
    fast = {(r.q_id, r.rank): (r.vec_id, r.cos_sim) for r in blocked_topk_pandas(q, e, k=5).collect()}
    assert expr.keys() == fast.keys()
    for key, (vid, sim) in expr.items():
        fvid, fsim = fast[key]
        # identical neighbor, similarity within float-reduction noise
        assert fvid == vid, (key, vid, fvid)
        assert abs(fsim - sim) < 1e-6
