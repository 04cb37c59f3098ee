"""Bloom-filter probing for cached entries (C11 — wired for real).

The reference built bloom filters over string columns of every cached
batch but never consulted them (ref ``src/core/cache_node.py:187-200``,
built at :189, no read path; its filter hashes with Python ``hash()`` —
not even stable across processes, ref ``src/core/bloom_filter.py:9-12``).

This index is built *distributively*: each executor computes the k bit
positions of its rows (md5-derived, portable), and only the distinct
set-bit positions travel to the driver (≤ m bits). Probes hash the
same way in pure Python — no Spark job per lookup. A point-lookup can
then skip any cached entry whose filter proves the key absent.

At the storage level the same role is played by parquet/Iceberg bloom
filters (``write.parquet.bloom-filter-enabled.column.X``), which Spark
scans consume natively; this class covers the *cache-entry* level the
reference aimed at.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20  # ~1M bits, the reference's default scale
DEFAULT_NUM_HASHES = 5  # ref src/core/bloom_filter.py:4


def _positions_expr(col: str, num_bits: int, num_hashes: int):
    """Spark-side bit positions: md5('<seed>:'||value) → 60-bit int % m.
    Mirrored bit-for-bit by _positions_py."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), F.col(col).cast("string"))), 1, 15
                    ),
                    16,
                    10,
                ).cast("bigint")
                % num_bits
            )
            for i in range(num_hashes)
        ]
    )


def _positions_py(value, num_bits: int, num_hashes: int) -> list[int]:
    return [
        int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:15], 16) % num_bits
        for i in range(num_hashes)
    ]


class EntryBloomIndex:
    """might_contain index over one column of a cached DataFrame."""

    def __init__(
        self,
        df: DataFrame,
        column: str,
        num_bits: int = DEFAULT_NUM_BITS,
        num_hashes: int = DEFAULT_NUM_HASHES,
    ) -> None:
        self.column = column
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        rows = (
            df.select(
                F.explode(_positions_expr(column, num_bits, num_hashes)).alias("pos")
            )
            .distinct()
            .collect()
        )
        self._bits = frozenset(r.pos for r in rows)

    def might_contain(self, value) -> bool:
        return all(
            p in self._bits
            for p in _positions_py(value, self.num_bits, self.num_hashes)
        )

    def definitely_absent(self, value) -> bool:
        return not self.might_contain(value)
