from .scalar import coerce_double, dec, extract_year, int_flag, money
from .udfs import lang_normalize_udf, sha256_udf

__all__ = [
    "coerce_double",
    "dec",
    "extract_year",
    "int_flag",
    "money",
    "lang_normalize_udf",
    "sha256_udf",
]
