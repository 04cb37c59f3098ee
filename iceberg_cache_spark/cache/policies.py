"""Pluggable eviction policies: LRU, LFU, composite cost score.

Engine-independent logic with the same semantics as the reference's
policy objects (ref ``src/core/eviction_policy.py:17-83``): given the
entry bookkeeping and a target size, return the keys to evict, in order.
The composite score is the reference's 0.4·age + 0.4·1/(freq+1) +
0.2·size_MB weighting (ref ``src/core/eviction_policy.py:62-66``).
"""

from __future__ import annotations

import time
from abc import ABC, abstractmethod
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from iceberg_cache_spark.cache.manager import CacheEntry


class EvictionPolicy(ABC):
    @abstractmethod
    def select_victims(
        self, entries: dict[str, "CacheEntry"], bytes_to_free: int
    ) -> list[str]:
        """Keys to evict (in eviction order) to free >= bytes_to_free."""

    @staticmethod
    def _take_until(
        ordered: list[tuple[str, int]], bytes_to_free: int
    ) -> list[str]:
        victims, freed = [], 0
        for key, size in ordered:
            if freed >= bytes_to_free:
                break
            victims.append(key)
            freed += size
        return victims


class LRUEvictionPolicy(EvictionPolicy):
    """Least-recently-used first."""

    def select_victims(self, entries, bytes_to_free):
        ordered = sorted(entries.items(), key=lambda kv: kv[1].last_accessed)
        return self._take_until([(k, e.size_bytes) for k, e in ordered], bytes_to_free)


class LFUEvictionPolicy(EvictionPolicy):
    """Least-frequently-used first; recency breaks ties."""

    def select_victims(self, entries, bytes_to_free):
        ordered = sorted(
            entries.items(), key=lambda kv: (kv[1].access_count, kv[1].last_accessed)
        )
        return self._take_until([(k, e.size_bytes) for k, e in ordered], bytes_to_free)


class CompositeEvictionPolicy(EvictionPolicy):
    """Weighted score: older + colder + bigger evicts first."""

    def __init__(
        self, w_age: float = 0.4, w_freq: float = 0.4, w_size: float = 0.2
    ) -> None:
        self.w_age, self.w_freq, self.w_size = w_age, w_freq, w_size

    def score(self, entry: "CacheEntry", now: float | None = None) -> float:
        now = now if now is not None else time.time()
        age = now - entry.created_at
        inv_freq = 1.0 / (entry.access_count + 1)
        size_mb = entry.size_bytes / (1024 * 1024)
        return self.w_age * age + self.w_freq * inv_freq + self.w_size * size_mb

    def select_victims(self, entries, bytes_to_free):
        now = time.time()
        ordered = sorted(
            entries.items(), key=lambda kv: self.score(kv[1], now), reverse=True
        )
        return self._take_until([(k, e.size_bytes) for k, e in ordered], bytes_to_free)
