"""Generate an sf1-equivalent TPC-H corpus for the bench anchor
(round 10 — VERDICT r9 item 6: all bench history is sf0.1; one
committed sf1 run anchors the 'within 2x at the same scale factor'
claim where shuffles actually cost something).

Method: replicate the driver's sf0.1 tables 10x with DISJOINT KEY
OFFSETS — copy i adds i * (max_key + 1) to every key column, so each
copy is a self-consistent key universe. This reproduces how TPC-H
itself scales: key domains (customer/part/supplier/orders/lineitem)
grow linearly, attribute domains (dates, flags, segments, the 25
nations) stay fixed, and every join keeps its exact per-key fan-out.
Pure replication, zero RNG — the corpus is bit-deterministic from the
sf0.1 input. region/nation are scale-invariant and copy verbatim.

This corpus is for PERFORMANCE anchoring only; correctness gates run
exclusively on the driver's own /root/testdata fixtures.

Output: <repo>/.scaledata/sf1_tpch/*.parquet with a _GENVER.json
sidecar (same regenerate-on-param-change contract as gen_scaledata).
"""
from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10

# table -> {column: offset_key_table} ; offsets derive from the max of
# the KEY-DOMAIN table so parent/child columns shift in lockstep.
KEY_COLS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
}
VERBATIM = ["region", "nation"]


def _params_hash() -> str:
    src_stat = []
    for t in sorted(list(KEY_COLS) + VERBATIM):
        p = os.path.join(SRC, f"{t}.parquet")
        st = os.stat(p)
        # size alone can collide on a content change that preserves byte
        # count (ADVICE r10) — mtime_ns makes the sidecar key content-aware
        src_stat.append((t, st.st_size, st.st_mtime_ns))
    blob = json.dumps({"copies": COPIES, "src": src_stat, "v": 2})
    return hashlib.md5(blob.encode()).hexdigest()


def default_out() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata",
        "sf1_tpch",
    )


def ensure_sf1(out: str | None = None) -> str:
    out = out or default_out()
    sidecar = os.path.join(out, "_GENVER.json")
    want = _params_hash()
    if os.path.exists(sidecar):
        with open(sidecar) as fh:
            if json.load(fh).get("hash") == want:
                return out
    os.makedirs(out, exist_ok=True)

    # offsets come from the key DOMAIN tables (the table whose primary
    # key defines the column's value space — lineitem has none of its
    # own, all three of its keys are foreign)
    domains = {
        dom for cols in KEY_COLS.values() for dom in cols.values()
    }
    maxes = {}
    for t in domains:
        key = next(c for c, dom in KEY_COLS[t].items() if dom == t)
        tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"), columns=[key])
        maxes[t] = pc.max(tbl[key]).as_py() + 1

    for t in VERBATIM:
        pq.write_table(
            pq.read_table(os.path.join(SRC, f"{t}.parquet")),
            os.path.join(out, f"{t}.parquet"),
        )
    for t, cols in KEY_COLS.items():
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        parts = []
        for i in range(COPIES):
            tb = src
            for col, dom in cols.items():
                shifted = pc.add(tb[col], pa.scalar(i * maxes[dom], tb[col].type))
                tb = tb.set_column(tb.schema.get_field_index(col), col, shifted)
            parts.append(tb)
        pq.write_table(pa.concat_tables(parts), os.path.join(out, f"{t}.parquet"))

    with open(sidecar, "w") as fh:
        json.dump({"hash": want, "copies": COPIES, "key_maxes": maxes}, fh)
    return out


if __name__ == "__main__":
    print(ensure_sf1())
