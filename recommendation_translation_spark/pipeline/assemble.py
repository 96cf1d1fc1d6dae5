"""Label/feature projection (SURVEY.md §2.2 P3/P4).

The reference's ``Utils.getWorkData`` (Utils.scala:30-48) does, per
target site, with typed lambdas and an RDD round-trip:

- filter rows by ``exists_<target> == 1.0`` (train) or ``0.0`` (score),
- emit ``(id, label = rank_<target>, features = DenseVector(all numeric
  columns except the target's own three))``.

Here both steps stay in Catalyst: the filter is a native Column
predicate (pushes down to parquet row groups when the matrix is read
from disk) and the vector assembly is ``VectorAssembler`` — no Python
in the data path.
"""

from __future__ import annotations

from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EXISTS, NOT_EXISTS

__all__ = ["numeric_feature_columns", "get_work_data"]


def numeric_feature_columns(all_columns: list[str], target: str) -> list[str]:
    """Every numeric feature column except the target site's own three.

    Mirrors the column slice in Utils.scala:41-44 (``[1, idx(pageviews_t))
    ∪ (idx(exists_t), end)``): drop ``pageviews_<t>``, ``rank_<t>``,
    ``exists_<t>`` and the id column, keep everything else in order.
    """
    excluded = {f"pageviews_{target}", f"rank_{target}", f"exists_{target}", "id"}
    return [c for c in all_columns if c not in excluded]


def get_work_data(features: DataFrame, target: str, exists: bool | None) -> DataFrame:
    """Filter by exists-flag and assemble (id, label, features).

    ``exists=True`` selects training rows (the item already exists on the
    target site, so its rank there is a usable label); ``exists=False``
    selects scoring rows (Utils.scala:30-32); ``exists=None`` keeps every
    row (score the full candidate set — an extension beyond the
    reference's two modes).
    """
    if exists is None:
        filtered = features
    else:
        flag = EXISTS if exists else NOT_EXISTS
        filtered = features.filter(F.col(f"exists_{target}") == flag)
    cols = numeric_feature_columns(features.columns, target)
    assembler = VectorAssembler(inputCols=cols, outputCol="features")
    assembled = assembler.transform(filtered)
    return assembled.select(
        F.col("id"),
        F.col(f"rank_{target}").alias("label"),
        F.col("features"),
    )
