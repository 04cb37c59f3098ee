"""Empty-input robustness gate: the full declared corpus on 0-row tables.

Runs EVERY declared query (oracle-matched ones compared vs DuckDB,
rows-only ones executed) against the all-empty fixture variant
(``tools/gen_emptydata.py``). An empty snapshot or fully-filtered
partition is routine at 100 TB; the engine contract is empty/degenerate
results, never a crash.

Queries in ``SKIP`` are excluded with a recorded justification — only
operator-contract exclusions belong there (an operator that documents a
non-empty input requirement), never engine crashes, which must be
fixed. Writes EMPTYCHECK_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROUND = os.environ.get("SPARK_GRAFT_ROUND", "6")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, f"EMPTYCHECK_r{ROUND}.json")

sys.path.insert(0, REPO)

# name -> reason (operator-contract exclusions only)
SKIP: dict[str, str] = {}


def main() -> int:
    from tools.gen_emptydata import ensure_emptydata
    from tools.verify_contract import build_session, load_entry

    sf = ensure_emptydata()
    spark = build_session()
    m = load_entry()
    from tests.oracle import compare

    queries, oracle = m.queries(), m.oracle_sql()
    results, failed = {}, 0
    for name in sorted(queries):
        if name in SKIP:
            results[name] = {"status": "skip", "reason": SKIP[name]}
            print(f"{name:<28} SKIP   {SKIP[name]}", flush=True)
            continue
        t0 = time.time()
        try:
            if name in oracle:
                compare(queries[name](spark, sf), oracle[name], sf)
                status = "match"
            else:
                queries[name](spark, sf).count()
                status = "runs"
            results[name] = {"status": status, "sec": round(time.time() - t0, 1)}
            print(f"{name:<28} {status.upper():6s} {time.time() - t0:5.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            failed += 1
            results[name] = {"status": "fail", "err": str(e)[:500]}
            print(f"{name:<28} FAIL   {str(e)[:200]}", flush=True)
    ok = sum(1 for r in results.values() if r["status"] in ("match", "runs"))
    print(f"RESULT: {ok} ok, {failed} failed, {len(SKIP)} skipped")
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
