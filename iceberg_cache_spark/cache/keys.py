"""Cache keys: table × snapshot × partition-filter × column-set.

Same keying scheme as the reference (``table#partition_json#md5cols``,
ref ``src/core/cache_data_model.py:64-73`` and
``src/core/cache_node.py:99-102``) extended with the snapshot id the
reference's ``PartitionInfo.get_cache_key`` already anticipated (ref
``src/core/cache_data_model.py:41-49``) — so a new table snapshot is a
cache miss instead of a stale hit.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class CacheKey:
    table_id: str
    partition_filter: tuple[tuple[str, Any], ...] = ()
    columns: tuple[str, ...] = ()
    snapshot_id: str | None = None

    @classmethod
    def of(
        cls,
        table_id: str,
        partition_filter: dict[str, Any] | None = None,
        columns: list[str] | None = None,
        snapshot_id: str | int | None = None,
    ) -> "CacheKey":
        pf = tuple(sorted((partition_filter or {}).items()))
        cols = tuple(sorted(columns or []))
        return cls(table_id, pf, cols, str(snapshot_id) if snapshot_id is not None else None)

    def __str__(self) -> str:
        part = json.dumps(dict(self.partition_filter), sort_keys=True, default=str)
        cols_hash = hashlib.md5(",".join(self.columns).encode()).hexdigest()[:8]
        snap = self.snapshot_id or "current"
        return f"{self.table_id}#{snap}#{part}#{cols_hash}"
