"""Memory budget accounting (C4).

The reference's ``ArrowMemoryManager`` tracks allocate/deallocate
against a budget of 80% of host RAM (ref
``src/core/arrow_memory_management.py:16-36``, budget at
``src/core/cache_node.py:34-36``). In Spark the executor memory manager
owns real memory; this tracker gates the *explicit cache pool* the same
way the reference gated its Arrow heap — admission control above
Spark's own accounting.
"""

from __future__ import annotations

import os
import threading


def host_memory_budget(fraction: float = 0.8) -> int:
    """fraction × total host RAM in bytes (the reference's 80% default)."""
    try:
        pages = os.sysconf("SC_PHYS_PAGES")
        page_size = os.sysconf("SC_PAGE_SIZE")
        return int(pages * page_size * fraction)
    except (ValueError, OSError):  # pragma: no cover - exotic platforms
        return int(8 * 1024**3 * fraction)


class MemoryBudget:
    """Thread-safe allocate/deallocate against a byte budget."""

    def __init__(self, budget_bytes: int | None = None) -> None:
        self.budget_bytes = budget_bytes or host_memory_budget()
        self._used = 0
        self._lock = threading.Lock()

    def allocate(self, size_bytes: int) -> bool:
        """Reserve bytes; False (no partial reservation) when over budget."""
        with self._lock:
            if self._used + size_bytes > self.budget_bytes:
                return False
            self._used += size_bytes
            return True

    def deallocate(self, size_bytes: int) -> None:
        with self._lock:
            self._used = max(0, self._used - size_bytes)

    def get_memory_usage(self) -> dict:
        with self._lock:
            return {
                "used_bytes": self._used,
                "budget_bytes": self.budget_bytes,
                "available_bytes": self.budget_bytes - self._used,
                "utilization": self._used / self.budget_bytes
                if self.budget_bytes
                else 0.0,
            }
