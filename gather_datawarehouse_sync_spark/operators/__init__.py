"""Operator library: reference semantics re-expressed as Spark compositions.

The reference-parity surface (cascading join, duplicate marking,
path-hierarchy dimension, CDC reconcile) exports here alongside the
LLM-pipeline extension families (exact + fuzzy dedup, incremental
new-vs-corpus dedup, similarity search); rarely-composed internals stay
in their modules.
"""

from gather_datawarehouse_sync_spark.operators.joins import (  # noqa: F401
    asof_join,
    band_join,
    choose_band_bucket_width,
    cascading_join,
    one_to_one_assign,
    pick_one_per_group,
)
from gather_datawarehouse_sync_spark.operators.dedup import (  # noqa: F401
    connected_components,
    cut_duplicate_spans,
    duplicate_spans,
    duplicate_spans_against,
    exact_dedup,
    jaccard_dedup_clusters,
    jaccard_pairs,
    jaccard_pairs_between,
    mark_duplicates,
    minhash_dedup,
    minhash_dedup_against,
    reference_gram_keys,
    simhash,
)
from gather_datawarehouse_sync_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_pairs,
    cosine_pairs_lsh,
    hybrid_rrf_topk,
    ivf_invert,
    ivf_topk,
    kmeans_centroids,
    lsh_topk,
    pq_encode,
    pq_topk,
    reassign_drifted_cells,
    semantic_cells,
    semantic_dedup,
    train_pq_codebooks,
)
from gather_datawarehouse_sync_spark.operators.sketches import (  # noqa: F401
    mg_heavy_hitters,
)
from gather_datawarehouse_sync_spark.operators.incremental_agg import (  # noqa: F401
    agg_state,
    finalize_agg,
    merge_agg_states,
    merge_quantile_states,
    quantile_state,
    quantiles_from_state,
)
from gather_datawarehouse_sync_spark.operators.sampling import (  # noqa: F401
    bucketed_negatives,
    cap_per_group,
    deterministic_sample,
    leakage_safe_split,
    shuffle_order,
    token_budget_sample,
    train_test_split,
    weighted_interleave,
)
from gather_datawarehouse_sync_spark.operators.hierarchy import (  # noqa: F401
    path_categories,
)
from gather_datawarehouse_sync_spark.operators.reconcile import (  # noqa: F401
    reconcile,
)
from gather_datawarehouse_sync_spark.operators.profile import (  # noqa: F401
    distribution_drift,
    profile,
)
