from etl_guiacores_spark.operators.dedupe import (
    dedupe_exact,
    dedupe_keyed,
    dedupe_keyed_first,
    split_duplicates,
)
from etl_guiacores_spark.operators.joins import merge_upsert, resume_anti_join

__all__ = [
    "dedupe_exact",
    "dedupe_keyed",
    "dedupe_keyed_first",
    "merge_upsert",
    "resume_anti_join",
    "split_duplicates",
]
