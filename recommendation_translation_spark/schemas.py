"""Explicit schemas for the reference data model.

The reference encodes these as Scala case classes (Utils.scala:8-14):

- ``SitelinkEntry(id, site, title)``
- ``PagecountEntry(site, title, pageviews)``
- ``SitelinkPageviewsEntry(id, site, title, pageviews)``
- ``RankedEntry(id, site, title, pageviews, rank)``

plus two runtime-constructed shapes: the wide feature matrix
(FeatureExtractor.scala:85-91: ``id`` + 3 double columns per sorted site)
and per-site predictions (ScorePredictor.scala:40-42).

PySpark has no typed Dataset, so the StructType IS the contract; readers
apply it explicitly or assert it after inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "SITELINK_SCHEMA",
    "PAGECOUNT_SCHEMA",
    "SITELINK_PAGEVIEWS_SCHEMA",
    "RANKED_SCHEMA",
    "EXISTS",
    "NOT_EXISTS",
    "feature_matrix_schema",
    "predictions_schema",
    "feature_column_names",
]

# Utils.scala:20-21 — the exists-flag constants.
EXISTS = 1.0
NOT_EXISTS = 0.0

SITELINK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
    ]
)

PAGECOUNT_SCHEMA = T.StructType(
    [
        T.StructField("site", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("pageviews", T.DoubleType(), False),
    ]
)

SITELINK_PAGEVIEWS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("pageviews", T.DoubleType(), False),
    ]
)

RANKED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("pageviews", T.DoubleType(), False),
        T.StructField("rank", T.DoubleType(), False),
    ]
)


def feature_column_names(sites: list[str]) -> list[str]:
    """Column order of the wide feature matrix.

    Mirrors FeatureExtractor.scala:85-91: ``id`` then, for each site in
    sorted order, ``pageviews_<site>``, ``rank_<site>``, ``exists_<site>``.
    """
    cols = ["id"]
    for site in sorted(sites):
        cols += [f"pageviews_{site}", f"rank_{site}", f"exists_{site}"]
    return cols


def feature_matrix_schema(sites: list[str]) -> T.StructType:
    """Wide feature matrix: 1 + 3·|sites| columns, all doubles but id."""
    fields = [T.StructField("id", T.StringType(), False)]
    for site in sorted(sites):
        for metric in ("pageviews", "rank", "exists"):
            fields.append(T.StructField(f"{metric}_{site}", T.DoubleType(), False))
    return T.StructType(fields)


def predictions_schema(sites: list[str]) -> T.StructType:
    """Prediction fold output: id + one nullable double per target site
    (ScorePredictor.scala:40-42,47)."""
    fields = [T.StructField("id", T.StringType(), False)]
    fields += [T.StructField(site, T.DoubleType(), True) for site in sorted(sites)]
    return T.StructType(fields)
