"""Catalog-contract invariants: the queries()/oracle_sql() surface the
correctness driver consumes stays internally consistent."""

from __future__ import annotations

import __spark_entry__ as entry_mod

from recommendation_translation_spark.queries import ORACLES, QUERIES

# The ONLY queries allowed to lack a DuckDB oracle (rows-only checks);
# every one needs a reason.  Growing this set silently weakens the
# correctness gate, so additions must edit this file.
ROWS_ONLY = {
    "ml_train_rmse": "RandomForest internals are not SQL-expressible",
    "ml_score_topk": "scores come from the trained RF models",
    "ml_feature_importance": "importances come from the RF internals",
    "ml_cv_tuning": "CrossValidator fold metrics come from RF fits",
    # dedup_clusters graduated to a full hash-checked oracle in round 4
    # (recursive-CTE transitive closure); the union-find property test
    # in tests/test_curation.py remains as the fast local pin.
    # events_approx_stats / events_sketch_stats graduated in round 5:
    # output = exact twins + deterministic 5%-error bound flags, so the
    # sketch accuracy itself is now hash-checked against DuckDB.
    "emb_kmeans_centroids": "iterative k-means training (Spark ML) is "
                            "not SQL-expressible",
    "doc_quality_classifier": "iterative LBFGS logistic-regression "
                              "training is not SQL-expressible",
    "ml_als_recs": "iterative ALS matrix factorization is not "
                   "SQL-expressible",
}


def test_every_query_has_oracle_or_documented_reason():
    missing = set(QUERIES) - set(ORACLES)
    assert missing == set(ROWS_ONLY), (
        f"undocumented rows-only queries: {missing - set(ROWS_ONLY)}; "
        f"stale ROWS_ONLY entries: {set(ROWS_ONLY) - missing}"
    )


def test_no_orphan_oracles():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_module_exposes_catalog():
    assert entry_mod.queries().keys() == QUERIES.keys()
    assert entry_mod.oracle_sql().keys() == ORACLES.keys()
