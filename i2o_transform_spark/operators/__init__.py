from i2o_transform_spark.operators.joins import (  # noqa: F401
    dictionary_join,
    salted_join,
    two_hop_maps_to,
)
from i2o_transform_spark.operators.intervals import merge_intervals  # noqa: F401
from i2o_transform_spark.operators.dedup import (  # noqa: F401
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    preference_dedup,
    simhash_near_dupes,
)
from i2o_transform_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    lsh_bucketed_topk,
)
from i2o_transform_spark.operators.reconcile import reconciliation_report  # noqa: F401
