"""Empty-table fixture variant for the empty-input robustness gate.

An empty snapshot, an all-filtered partition, or a brand-new table is
routine at 100 TB — a query engine must return empty (or correctly
degenerate) results, never crash. This derives a 0-row copy of every
fixture table with the exact sf0.001 schemas, so
``tools/verify_empty.py`` can run the whole declared corpus against
DuckDB on it. Trivially deterministic; `_GENVER.json` sidecar for the
same regeneration discipline as the other variants.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# the engine's own table list, so a table added to the star schema can
# never be silently missing from the empty variant (r6 review)
from iceberg_cache_spark.sources.testdata import TABLE_NAMES as TABLES  # noqa: E402

SRC = "/root/testdata/sf0.001"
DST = os.path.join(_REPO, ".emptydata", "sf0")
GEN_VERSION = 1


def generate(src: str = SRC, dst: str = DST) -> None:
    os.makedirs(dst, exist_ok=True)
    for table in TABLES:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        pq.write_table(t.slice(0, 0), os.path.join(dst, f"{table}.parquet"))
    with open(os.path.join(dst, "_GENVER.json"), "w") as fh:
        json.dump({"version": GEN_VERSION, "tables": list(TABLES)}, fh)
    print(f"wrote {len(TABLES)} empty tables to {dst}")


def ensure_emptydata(src: str = SRC, dst: str = DST) -> str:
    sidecar = os.path.join(dst, "_GENVER.json")
    if os.path.exists(sidecar):
        try:
            with open(sidecar) as fh:
                if json.load(fh) == {
                    "version": GEN_VERSION,
                    "tables": list(TABLES),
                }:
                    return dst
        except Exception:
            pass
    generate(src, dst)
    return dst


if __name__ == "__main__":
    generate()
