from marketing_attribution_etl_framework__maef_spark.functions.cleaning import (
    clean_float,
    nullif_empty,
    normalize_channel,
    normalize_date,
)
from marketing_attribution_etl_framework__maef_spark.functions.dates import (
    date_range_predicate,
    validate_date_range,
)

__all__ = [
    "clean_float",
    "nullif_empty",
    "normalize_channel",
    "normalize_date",
    "date_range_predicate",
    "validate_date_range",
]
