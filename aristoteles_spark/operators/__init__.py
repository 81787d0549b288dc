"""Relational + ML-data operators built on DataFrame primitives.

Public surface (each module documents its 100 TB scale design):

dedup:       exact_dedup_groups, normalized_dedup_groups,
             ngram_jaccard_pairs (AllPairs prefix filter),
             minhash_signatures, minhash_lsh_pairs,
             minhash_cluster_edges (star+bridge contraction),
             simhash_sketches, simhash_pairs
similarity:  dot, l2_norm, cosine, knn_brute, knn_lsh, neardup_pairs,
             hyperplanes, lsh_signature
temporal:    asof_join, interval_join_binned
sketches:    kmv_distinct_estimate
skew:        salted_agg
graph:       connected_components (two-level contraction)
"""

from aristoteles_spark.operators.dedup import (  # noqa: F401
    exact_dedup_groups,
    minhash_cluster_edges,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    normalized_dedup_groups,
    simhash_pairs,
    simhash_sketches,
)
from aristoteles_spark.operators.similarity import (  # noqa: F401
    cosine,
    dot,
    hyperplanes,
    knn_brute,
    knn_lsh,
    l2_norm,
    lsh_signature,
    neardup_pairs,
)
from aristoteles_spark.operators.graph import connected_components  # noqa: F401
from aristoteles_spark.operators.sketches import kmv_distinct_estimate  # noqa: F401
from aristoteles_spark.operators.skew import salted_agg  # noqa: F401
from aristoteles_spark.operators.temporal import (  # noqa: F401
    asof_join,
    interval_join_binned,
)
