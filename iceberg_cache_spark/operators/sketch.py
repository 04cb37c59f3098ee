"""Count-min sketch: sublinear frequency summaries built as a DataFrame.

Build: d seed rows × w buckets; each key increments one cell per seed
(groupBy (seed, bucket) — partial-aggregated, one shuffle, output is
d·w rows regardless of input size). Estimate: min over seeds of the
key's cell counts — a one-sided overestimate (classic CMS guarantee).

Hashing is the repo's portable md5 scheme (same int on JVM, DuckDB,
and Python — see cache/bloom.py), so sketches are reproducible across
engines and the build is oracle-checkable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, seed: int, width: int) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col(col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def _bucket_py(value, seed: int, width: int) -> int:
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:15], 16) % width


def build_count_min(
    df: DataFrame, key_col: str, depth: int = 3, width: int = 64
) -> DataFrame:
    """(seed, bucket, cnt) cells of the CMS over ``key_col``."""
    parts = []
    for seed in range(depth):
        parts.append(
            df.select(
                F.lit(seed).alias("seed"),
                _bucket_expr(key_col, seed, width).alias("bucket"),
            )
        )
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)
    return stacked.groupBy("seed", "bucket").agg(F.count("*").alias("cnt"))


def estimate_count(cells: list[tuple], value, depth: int = 3, width: int = 64) -> int:
    """Point frequency estimate from collected cells [(seed,bucket,cnt)]."""
    lookup = {(s, b): c for s, b, c in cells}
    return min(
        lookup.get((seed, _bucket_py(value, seed, width)), 0) for seed in range(depth)
    )
