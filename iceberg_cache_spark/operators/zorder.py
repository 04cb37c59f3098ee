"""Z-order (Morton) file clustering — multi-column data skipping.

A single-column sort gives tight per-file min/max zone maps on ONE
column; Z-order interleaves the bits of several columns' bucket codes
so every file covers a small hyper-rectangle and range predicates on
ANY clustered column prune files. This is the standard lakehouse
OPTIMIZE/CLUSTER BY technique (public: Delta OPTIMIZE ZORDER BY,
Iceberg sort orders); implemented here as pure DataFrame expressions —
bucketize from exact bounds, interleave bits, repartitionByRange on the
z-value, sortWithinPartitions, write.

Scale: the bounds pass is one cheap agg (or parquet footer stats via
the catalog); repartitionByRange samples the z-distribution so output
files are even-sized regardless of skew; nothing collects to the
driver. The z computation is whole-stage-codegen integer math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 8  # bits per dimension


def morton_code(cols: list[Column], bits: int = ZBITS) -> Column:
    """Interleave ``bits`` bits from each bucket-code column (col 0 gets
    the highest-significance lanes). Works for any number of dims."""
    n = len(cols)
    z = F.lit(0)
    for k in range(bits):
        for j, c in enumerate(cols):
            # bit k of column j lands at position k*n + (n-1-j)
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, k) % 2, k * n + (n - 1 - j))
            )
    return z


def bucketize(col: Column, lo: Column, hi: Column, bits: int = ZBITS) -> Column:
    """Map a numeric column to [0, 2^bits - 1] by linear scaling from
    exact [lo, hi] bounds. hi maps to the top bucket exactly."""
    top = float(2**bits - 1)
    return F.floor((col - lo) * top / (hi - lo)).cast("int")


def zorder_code(df: DataFrame, cols: list[str], bits: int = ZBITS) -> DataFrame:
    """Return ``df`` with a ``__z`` column: the Morton code of the
    bucketized ``cols``. Bounds come from one broadcast 1-row agg."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__lo_{c}"))
        aggs.append(F.max(c).alias(f"__hi_{c}"))
    bounds = df.agg(*aggs)
    coded = df.join(F.broadcast(bounds))
    codes = [
        bucketize(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits)
        for c in cols
    ]
    keep = [f for f in df.columns]
    return coded.select(*keep, morton_code(codes, bits).alias("__z"))


def zorder_write(
    df: DataFrame, cols: list[str], out_path: str, n_files: int = 16
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    Z-order of ``cols``: range-partition on the z-value (sampled
    boundaries — even file sizes under skew), locally sort each
    partition, drop the helper column at the writer."""
    coded = zorder_code(df, cols)
    (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def file_ranges(spark, path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of ``cols`` (the zone maps a scan would prune
    with). Reads footer-level stats via a grouped scan on the file-name
    pseudo-column — no full decode of the data columns at scale if the
    format exposes stats; here computed exactly for the test."""
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return [r.asDict() for r in df.groupBy("__file").agg(*aggs).collect()]
