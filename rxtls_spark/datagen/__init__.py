from rxtls_spark.datagen.lookups import log_operators_df, tld_suffixes_df
from rxtls_spark.datagen.pages import pages_df, pages_from_documents

__all__ = [
    "log_operators_df",
    "tld_suffixes_df",
    "pages_df",
    "pages_from_documents",
]
