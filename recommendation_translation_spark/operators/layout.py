"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping.

Parquet skips row groups via per-column min/max statistics, but a scan
only benefits when rows that are close in the FILTER columns are close
in the FILES.  A plain sort gives that for one column and destroys it
for every other; interleaving the bits of several normalized columns
into one Morton code and range-partition-sorting on it keeps every
clustered column's per-file min/max range narrow simultaneously — the
technique behind `OPTIMIZE ... ZORDER BY` in lakehouse table formats
(public: Morton 1966; Delta/Iceberg docs).  At 100 TB this is the
difference between scanning ~1/√F of the files for a 2-column point
range and scanning all of them.

Everything is native Column expressions (bit ops + conditionals); the
only driver-side data is one min/max row per clustered column (bounded
by the column COUNT, not the data).  No reference counterpart —
extension surface for the training-data lake.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_dataframe", "write_zordered"]

# bits per dimension; 2 dims × 16 bits = 32-bit Morton codes (longs)
_BITS = 16


def _normalize_to_grid(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Affine-map ``col`` from [lo, hi] onto the integer grid
    [0, 2**bits); constant columns (hi == lo) map to 0."""
    cells = (1 << bits) - 1
    if hi == lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.round(clamped * F.lit(float(cells))).cast("long")


def zorder_key(cols: list[Column], bounds: list[tuple[float, float]],
               bits: int = _BITS) -> Column:
    """Morton code: interleave ``bits`` bits of each normalized column.

    Bit b of dimension d lands at position ``b * n_dims + d``; built as
    a sum of shifted single-bit terms (pure long arithmetic — the
    result is < 2**(bits*n_dims), so no sign-bit hazard at the default
    16 bits × ≤3 dims)."""
    n = len(cols)
    if not 1 <= n <= 3:
        raise ValueError(f"zorder_key supports 1-3 dimensions, got {n}")
    if bits * n > 62:
        raise ValueError(f"bits={bits} × {n} dims overflows a long")
    grids = [
        _normalize_to_grid(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)
    ]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, g in enumerate(grids):
            bit = F.shiftrightunsigned(g, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + d)
    return z


def zorder_dataframe(df: DataFrame, cols: list[str], bits: int = _BITS,
                     n_files: int | None = None) -> DataFrame:
    """Return ``df`` re-laid-out in Z-order on ``cols``.

    One bounded aggregate collects each column's min/max (one row, 2×
    n_dims values — the same bounded-collect class as IVF centroids);
    the Morton key then range-partitions + sorts, so consecutive
    output files cover compact hyper-rectangles of the clustered
    space.  ``n_files`` defaults to the session's shuffle
    parallelism."""
    spark = df.sparkSession
    row = df.agg(
        *[F.min(c).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    bounds = [
        (float(row[f"lo_{i}"]), float(row[f"hi_{i}"])) for i in range(len(cols))
    ]
    z = zorder_key([F.col(c) for c in cols], bounds, bits=bits)
    if n_files is None:
        try:
            n_files = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        except ValueError:
            n_files = 200
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = _BITS, n_files: int | None = None,
                   mode: str = "errorifexists") -> None:
    """Z-order ``df`` on ``cols`` and write parquet: every written file
    then carries narrow min/max ranges for ALL of ``cols``, so a later
    filtered scan prunes row groups on any of them."""
    zorder_dataframe(df, cols, bits=bits, n_files=n_files).write.mode(mode).parquet(path)
