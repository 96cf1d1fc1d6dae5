"""The main correctness gate, run exactly the way the driver runs it:
every query with an oracle is executed on Spark and DuckDB at sf0.01 and
compared order-insensitively (row count + columns + values)."""

from __future__ import annotations

import pytest

from recommendation_translation_spark.queries import ORACLES, QUERIES

from .conftest import SF_ORACLE
from .oracle_utils import compare

ORACLE_QUERIES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spark_df = QUERIES[name](spark, SF_ORACLE)
    duck_rel = duck.sql(ORACLES[name])
    ok, msg = compare(spark_df, duck_rel)
    assert ok, f"{name}: {msg}"


# Queries with no SQL oracle: ML model fits, the iterative
# connected-components fixpoint, and sketch-based approximations
# (driver records rows-only checks; accuracy is bounded in tests).
NO_ORACLE = {
    "ml_train_rmse",
    "ml_score_topk",
    "ml_feature_importance",
    "ml_cv_tuning",
    "dedup_clusters",
    "events_approx_stats",
    "events_sketch_stats",
}


def test_all_queries_have_oracle_or_are_ml():
    missing = set(QUERIES) - set(ORACLES)
    assert missing == NO_ORACLE, missing
