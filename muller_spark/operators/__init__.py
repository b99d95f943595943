from muller_spark.operators.aggregate import aggregate_vectorized
from muller_spark.operators.analytics import (
    cohort_retention,
    event_transitions,
    funnel,
)
from muller_spark.operators.dedup import (
    dedup_against_ledger,
    init_dedup_ledger,
    canonical_keep_list,
    contamination_report,
    dedup_clusters,
    duplicate_passages,
    exact_dedup,
    embedding_near_dups,
    minhash_lsh_pairs,
    minhash_portable_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
    simhash_portable,
    simhash_portable_near_dups,
)
from muller_spark.operators.pagination import paginate
from muller_spark.operators.packing import global_cumsum, pack_concat_chunks
from muller_spark.operators.topk import topk_per_group
from muller_spark.operators.quality import (
    gopher_filter,
    group_zscores,
    pii_scan,
    repetition_stats,
)
from muller_spark.operators.sampling import (
    deterministic_sample,
    mixture_sample,
    deterministic_split,
    stratified_sample,
)
from muller_spark.operators.validate import (
    duplicate_keys,
    validate,
    validate_or_raise,
)

__all__ = [
    "aggregate_vectorized", "paginate", "topk_per_group",
    "global_cumsum", "pack_concat_chunks",
    "funnel", "cohort_retention", "event_transitions",
    "exact_dedup", "minhash_lsh_pairs", "minhash_portable_pairs",
    "simhash", "simhash_portable", "simhash_near_dups",
    "simhash_portable_near_dups", "ngram_jaccard_pairs",
    "embedding_near_dups", "duplicate_passages", "contamination_report",
    "dedup_clusters", "canonical_keep_list",
    "init_dedup_ledger", "dedup_against_ledger",
    "repetition_stats", "gopher_filter", "pii_scan", "group_zscores",
    "deterministic_sample", "deterministic_split", "stratified_sample",
    "mixture_sample",
    "validate", "duplicate_keys", "validate_or_raise",
]
