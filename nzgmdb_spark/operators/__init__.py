from nzgmdb_spark.operators.relational import (  # noqa: F401
    anti_join,
    coalesce_override_join,
    dedup_keep_last,
    semi_join,
    split_by_value,
    upsert_by_key,
)
from nzgmdb_spark.operators.windows import (  # noqa: F401
    first_matching,
    group_argmin,
    mark_duplicates,
    rolling_mean_centered,
)
