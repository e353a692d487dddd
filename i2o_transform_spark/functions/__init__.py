from i2o_transform_spark.functions.text import (  # noqa: F401
    codelist_explode,
    path_segment,
    prefix_strip,
    truncate_source_value,
)
from i2o_transform_spark.functions.hashing import (  # noqa: F401
    content_id,
    shingles,
    stable_hash,
)
from i2o_transform_spark.functions.textstats import (  # noqa: F401
    doc_fingerprint,
    language_scores,
    quality_columns,
    token_count,
    tokens,
)
