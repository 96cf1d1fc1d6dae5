from .readers import (
    read_sitelinks_tsv,
    read_raw_data_tsv,
    read_pagecounts,
    read_pageview_sql,
    read_parsed_parquet,
    read_features_parquet,
    load_testdata,
    TESTDATA_TABLES,
)
from .writers import (
    write_parquet,
    write_predictions_csv,
)

__all__ = [
    "read_sitelinks_tsv",
    "read_raw_data_tsv",
    "read_pagecounts",
    "read_pageview_sql",
    "read_parsed_parquet",
    "read_features_parquet",
    "load_testdata",
    "TESTDATA_TABLES",
    "write_parquet",
    "write_predictions_csv",
]
