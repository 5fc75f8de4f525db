from etl_guiacores_spark.functions.address import split_address
from etl_guiacores_spark.functions.contact import (
    clean_phone_list,
    format_phone_variant,
    normalize_phone,
    normalize_phone_list,
)
from etl_guiacores_spark.functions.ids import business_id_from_url, total_matches
from etl_guiacores_spark.functions.text import (
    clean_text,
    coerce_bool,
    coerce_long,
    empty_to_null,
    from_na,
    scrub_social,
    to_na,
    validate_email,
)
from etl_guiacores_spark.functions.url import normalize_url, validate_url

__all__ = [
    "business_id_from_url",
    "clean_phone_list",
    "clean_text",
    "coerce_bool",
    "coerce_long",
    "empty_to_null",
    "format_phone_variant",
    "from_na",
    "normalize_phone",
    "normalize_phone_list",
    "normalize_url",
    "scrub_social",
    "split_address",
    "to_na",
    "total_matches",
    "validate_email",
    "validate_url",
]
