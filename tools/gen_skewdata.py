"""Skewed-key fixture variant for the skew-robustness gate.

At 100 TB the data is never uniform: one user produces most of the
events, one source dominates the corpus, one customer places most of
the orders (Zipf everywhere). The standard fixtures are near-uniform,
so the correctness gates never witness hot-key behavior — the exact
regime where partition-parallel plans diverge from single-node oracles
if any operator's determinism quietly leans on key uniformity (window
tiebreaks inside a giant partition, per-group budgets when one group
IS the corpus, salting fan-in). This derives a byte-deterministic copy
of the fixtures where the natural grouping/join keys are collapsed
onto dominant values, so ``tools/verify_skew.py`` can hash-check the
ENTIRE oracle-matched corpus under heavy skew.

Policy (explicit, auditable):

- ROW-IDENTITY keys stay untouched (`event_id`, `doc_id`, `vec_id`,
  `o_orderkey`, `(l_orderkey, l_linenumber)`, dim primary keys):
  skewing those would break the uniqueness that total ORDER BY
  tiebreaks and keep-one dedup semantics are declared over;
- grouping / foreign-key attributes collapse onto the column's MOST
  FREQUENT existing value (deterministic; ties -> smallest) for a
  deterministic ~85% of rows, mask keyed on the row's id arithmetic —
  the remaining rows keep their original values so group-by outputs
  stay multi-group;
- text/value payloads stay untouched: dedup/similarity operators need
  the real distribution, and skewing a measure changes no plan shape.

Output: /root/repo/.skewdata/<sf>/*.parquet (gitignored; sidecar
`_GENVER.json` regenerates on any policy change, same discipline as
the NULL/empty variants).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF = os.environ.get("SPARK_GRAFT_SKEW_SF", "sf0.001")
SRC = f"/root/testdata/{SF}"
DST = os.path.join(_REPO, ".skewdata", SF)

# table -> (row-unique id columns driving the mask,
#           columns collapsed onto their modal value for ~SKEW_PCT rows)
PLAN: dict[str, tuple[list[str], list[str]]] = {
    "customer": (["c_custkey"], ["c_mktsegment", "c_nationkey"]),
    "documents": (["doc_id"], ["source", "lang"]),
    "embeddings": (["vec_id"], ["label"]),
    "events": (["event_id"], ["user_id", "event_type"]),
    "lineitem": (["l_orderkey", "l_linenumber"], ["l_suppkey", "l_returnflag"]),
    "nation": (["n_nationkey"], []),  # 25-row dim: keys are identity, skip
    "orders": (["o_orderkey"], ["o_custkey", "o_orderpriority"]),
    "part": (["p_partkey"], ["p_brand", "p_type"]),
    "region": (["r_regionkey"], []),
    "supplier": (["s_suppkey"], ["s_nationkey"]),
}

SKEW_ONE_IN = 7  # rows with (mix % 7) != 0 collapse -> ~86% hot key

GEN_VERSION = 1


def _genver(sf: str) -> dict:
    return {
        "version": GEN_VERSION,
        "sf": sf,
        "skew_one_in": SKEW_ONE_IN,
        "plan": {t: [ids, cols] for t, (ids, cols) in sorted(PLAN.items())},
    }


def _mask(ids: np.ndarray, col_idx: int) -> np.ndarray:
    """Deterministic ~(1 - 1/SKEW_ONE_IN) hot mask per (row, column) —
    same splitmix-style mix as the NULL variant so masks are stable
    across runs/machines and decorrelated between columns."""
    with np.errstate(over="ignore"):
        x = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        x ^= np.uint64(((col_idx + 1) * 0xA24BAED4963EE407) & 0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
    return (x % np.uint64(SKEW_ONE_IN)) != 0


def _modal_value(col: pa.ChunkedArray):
    """Most frequent non-null value; ties break on the smallest value
    so the choice is deterministic on any arrow version."""
    vc = col.value_counts()
    values, counts = vc.field("values"), vc.field("counts")
    best = None
    for v, c in zip(values.to_pylist(), counts.to_pylist()):
        if v is None:
            continue
        if best is None or c > best[1] or (c == best[1] and v < best[0]):
            best = (v, c)
    return best[0] if best else None


def generate(src: str = SRC, dst: str = DST, sf: str = SF) -> None:
    os.makedirs(dst, exist_ok=True)
    for table, (id_cols, cols) in PLAN.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        ids = np.zeros(len(t), dtype=np.int64)
        with np.errstate(over="ignore"):
            for c in id_cols:
                ids = ids * np.int64(1_000_003) + np.asarray(
                    t.column(c).to_pandas(), dtype=np.int64
                )
        arrays, names = [], []
        for name in t.schema.names:
            col = t.column(name).combine_chunks()
            if name in cols and len(t):
                hot = _modal_value(col)
                if hot is not None:
                    m = pa.array(_mask(ids, cols.index(name)))
                    col = pc.if_else(m, pa.scalar(hot, type=col.type), col)
            arrays.append(col)
            names.append(name)
        pq.write_table(
            pa.table(dict(zip(names, arrays))),
            os.path.join(dst, f"{table}.parquet"),
        )
    with open(os.path.join(dst, "_GENVER.json"), "w") as fh:
        json.dump(_genver(sf), fh)
    print(f"wrote skewed variant of {len(PLAN)} tables to {dst}")


def ensure_skewdata(src: str = SRC, dst: str = DST, sf: str = SF) -> str:
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


HOTKEY_GEN_VERSION = 1


def ensure_hotkey_events(n_rows: int, base: str | None = None) -> str:
    """Deterministic hot-key events corpus for the skew perf probe:
    ~86% of rows on one user (same 1-in-SKEW_ONE_IN mask as the
    correctness variant), timestamps uniform over 90 days at 1 s
    resolution (dense enough that the hot user's events sit far inside
    one gap/frame — the chain/window worst case). Sidecar-versioned
    like every other generated corpus."""
    dst = os.path.join(base or os.path.join(_REPO, ".skewdata"), f"hotkey_{n_rows}")
    sidecar = os.path.join(dst, "_GENVER.json")
    want = {"version": HOTKEY_GEN_VERSION, "n_rows": n_rows}
    if os.path.exists(sidecar):
        try:
            with open(sidecar) as fh:
                if json.load(fh) == want:
                    return dst
        except Exception:
            pass
    os.makedirs(dst, exist_ok=True)
    ids = np.arange(n_rows, dtype=np.int64)
    hot = (ids * np.int64(0x9E3779B9) % np.int64(SKEW_ONE_IN)) != 0
    users = np.where(hot, np.int64(14), ids % 50).astype(np.int64)
    # splitmix over the id: deterministic "uniform" seconds offset
    with np.errstate(over="ignore"):
        x = ids.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(31)
    secs = (x % np.uint64(90 * 86_400)).astype(np.int64)
    base_us = np.int64(1_700_000_000_000_000)
    ts = base_us + secs * np.int64(1_000_000)
    val = ((x >> np.uint64(7)) % np.uint64(10_000)).astype(np.int64) / 100.0 - 50.0
    t = pa.table(
        {
            "event_id": ids,
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": users,
            "event_type": pa.array(
                np.where(ids % 3 == 0, "view", np.where(ids % 3 == 1, "click", "purchase"))
            ),
            "value": val,
            "props": pa.array(["{}"] * n_rows),
        }
    )
    pq.write_table(t, os.path.join(dst, "events.parquet"))
    with open(sidecar, "w") as fh:
        json.dump(want, fh)
    return dst
