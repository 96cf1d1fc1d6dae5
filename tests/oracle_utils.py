"""Order-insensitive Spark-vs-DuckDB comparison, mimicking the driver's
correctness gate (row count + schema + value hash)."""

from __future__ import annotations

import math

import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical text form; values are pre-rounded by the queries
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    dk = duck_rel.df()
    if sorted(sp.columns) != sorted(dk.columns):
        return False, f"columns differ: spark={sorted(sp.columns)} duck={sorted(dk.columns)}"
    if len(sp) != len(dk):
        return False, f"row counts differ: spark={len(sp)} duck={len(dk)}"
    a, b = normalize(sp), normalize(dk)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        only_a = [r for r in a[:2000] if r not in set(b)][:3]
        return False, f"values differ; first pairwise diffs: {diffs}; spark-only: {only_a}"
    return True, "ok"
