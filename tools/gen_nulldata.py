"""NULL-injected fixture variant for the NULL-robustness gate.

Round 5's only driver-red row (q153) was a 0-vs-NULL divergence that
stayed latent for four rounds because the fixture corpus contains zero
NULLs in any nullable column — Spark and the DuckDB oracle agreed on
every query while silently disagreeing on all-NULL aggregate frames.
This tool manufactures the missing evidence class: a byte-deterministic
copy of /root/testdata/sf0.001 with ~7% NULLs injected into the columns
a real lake would plausibly have them in, so `tools/verify_nulls.py`
can run the ENTIRE oracle-matched corpus on NULL-bearing data.

Policy (documented so the gate's coverage is explicit):

- identity / join-key columns stay non-null (`*_key`, `doc_id`,
  `vec_id`, `event_id`, `user_id`, `o_custkey`): nulling them changes
  the declared semantics of most queries rather than exercising NULL
  handling inside them;
- `events.ts` IS masked (round 7): round 6's driver red proved the old
  "rolling_time_agg contracts a non-null ts" exemption was exactly
  where a real divergence hid — NULL ordering keys take the SQL
  NULL-peer-group RANGE frame, and only an injected corpus exercises
  that class through q152/q153/q156/q157;
- `embeddings.embedding` stays non-null: NULL vectors are a documented
  hard error on the arrow ANN path (see PARITY.md) and the ANN queries
  are rows-only anyway;
- everything else nullable gets a deterministic ~7% NULL mask keyed on
  xxhash-free arithmetic over the row's id column (no RNG state — the
  same bytes on every run, any machine).

Output: /root/repo/.nulldata/<sf>/*.parquet (gitignored; ~1 MB at the
default sf0.001). Set SPARK_GRAFT_NULL_SF=sf0.01 to derive the variant
from the driver-scale fixtures instead (10× the rows → 10× the NULL
combinations through every operator; `tools/verify_nulls.py` honors
the same variable).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = os.environ.get("SPARK_GRAFT_NULL_SF", "sf0.001")
SRC = f"/root/testdata/{SF}"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".nulldata",
    SF,
)

# table -> (ROW-UNIQUE id columns driving the mask, columns to inject
# into). The id tuple must identify a row uniquely or all rows sharing
# it get an identical per-column NULL fate (lineitem needs
# (l_orderkey, l_linenumber) — l_orderkey alone would clump NULLs
# per order; r6 review finding).
PLAN: dict[str, tuple[list[str], list[str]]] = {
    "customer": (["c_custkey"], ["c_acctbal", "c_mktsegment", "c_name"]),
    "documents": (["doc_id"], ["lang", "source", "text"]),
    "embeddings": (["vec_id"], ["label"]),
    "events": (["event_id"], ["value", "props", "event_type", "ts"]),
    "lineitem": (
        ["l_orderkey", "l_linenumber"],
        [
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ],
    ),
    "nation": (["n_nationkey"], []),  # 25-row join dim: keys only, skip
    "orders": (["o_orderkey"], ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]),
    "part": (["p_partkey"], ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
    "region": (["r_regionkey"], []),  # 5-row join dim: keys only, skip
    "supplier": (["s_suppkey"], ["s_acctbal", "s_name"]),
}

NULL_ONE_IN = 14  # ~7%

# Bump when PLAN / NULL_ONE_IN / _mask change: a _GENVER.json sidecar
# records (version, sf, plan, rate); ensure_nulldata() regenerates any
# directory whose sidecar mismatches, so gate runs and tests can never
# silently reuse stale bytes from an older generator (the same
# discipline as gen_scaledata's sidecar).
GEN_VERSION = 3


def _genver(sf: str) -> dict:
    return {
        "version": GEN_VERSION,
        "sf": sf,
        "null_one_in": NULL_ONE_IN,
        "plan": {t: [ids, cols] for t, (ids, cols) in sorted(PLAN.items())},
    }


def _mask(ids: np.ndarray, col_idx: int) -> np.ndarray:
    """Deterministic per-(row, column) NULL mask: a splitmix-style mix
    of the id and the column's position — stable across runs/machines,
    decorrelated between columns so multi-column rows exist with every
    NULL combination."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        x = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        x ^= np.uint64(((col_idx + 1) * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
    return (x % np.uint64(NULL_ONE_IN)) == 0


def generate(src: str = SRC, dst: str = DST, sf: str = SF) -> None:
    import json

    os.makedirs(dst, exist_ok=True)
    for table, (id_cols, cols) in PLAN.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        # fold the row-unique id tuple into one int64 stream for the mask
        ids = np.zeros(len(t), dtype=np.int64)
        with np.errstate(over="ignore"):
            for c in id_cols:
                ids = ids * np.int64(1_000_003) + np.asarray(
                    t.column(c).to_pandas(), dtype=np.int64
                )
        arrays, names = [], []
        for name in t.schema.names:
            col = t.column(name).combine_chunks()
            if name in cols:
                m = _mask(ids, cols.index(name))
                pa_mask = pa.array(m)
                col = pa.compute.if_else(
                    pa_mask, pa.nulls(len(t), col.type), col
                )
            arrays.append(col)
            names.append(name)
        out = pa.table(dict(zip(names, arrays)))
        pq.write_table(out, os.path.join(dst, f"{table}.parquet"))
        injected = sum(
            out.column(c).null_count for c in cols
        )
        print(f"{table}: {len(t)} rows, {injected} NULLs over {len(cols)} cols")
    with open(os.path.join(dst, "_GENVER.json"), "w") as fh:
        json.dump(_genver(sf), fh, indent=1, sort_keys=True)


def ensure_nulldata(src: str = SRC, dst: str = DST, sf: str = SF) -> str:
    """Return ``dst``, regenerating it unless its sidecar matches the
    current generator (version, sf, plan, rate)."""
    import json

    sidecar = os.path.join(dst, "_GENVER.json")
    if os.path.exists(sidecar):
        try:
            with open(sidecar) as fh:
                if json.load(fh) == _genver(sf):
                    return dst
        except Exception:
            pass
    generate(src, dst, sf)
    return dst


if __name__ == "__main__":
    generate()
