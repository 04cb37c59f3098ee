from iceberg_cache_spark.cache.keys import CacheKey
from iceberg_cache_spark.cache.manager import CacheEntry, CacheManager
from iceberg_cache_spark.cache.policies import (
    CompositeEvictionPolicy,
    EvictionPolicy,
    LFUEvictionPolicy,
    LRUEvictionPolicy,
)

__all__ = [
    "CacheKey",
    "CacheEntry",
    "CacheManager",
    "EvictionPolicy",
    "LRUEvictionPolicy",
    "LFUEvictionPolicy",
    "CompositeEvictionPolicy",
]
