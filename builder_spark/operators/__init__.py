"""DataFrame-level operators: deduplication, similarity search,
sessionization, as-of joins. Each takes and returns DataFrames and is
designed around its shuffle behavior at 100 TB (see per-module notes).
"""

from builder_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_near_dupes,
)
from builder_spark.operators.partitioning import (
    ntile_from_rank,
    salted_sum_count,
    spread,
    stitched_running,
)
from builder_spark.operators.similarity import brute_force_topk, knn_majority_label
from builder_spark.operators.topk import grouped_topk

__all__ = [
    "brute_force_topk",
    "exact_dedup",
    "grouped_topk",
    "jaccard_pairs",
    "knn_majority_label",
    "minhash_lsh_candidates",
    "minhash_near_dupes",
    "ntile_from_rank",
    "salted_sum_count",
    "spread",
    "stitched_running",
]
