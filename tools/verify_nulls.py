"""NULL-robustness gate: the full oracle-matched corpus on NULL data.

Runs every ``ORACLE``-matched declared query against the NULL-injected
fixture variant (``tools/gen_nulldata.py`` → ``.nulldata/sf0.001``) and
compares Spark vs DuckDB with the driver-identical canonicalization —
the evidence class round 5's q153 red proved was missing: the standard
fixtures contain zero NULLs, so a 0-vs-NULL divergence can stay latent
through every green round.

Writes NULLCHECK_r{N}.json (same shape as CORRECTNESS_local). Queries
listed in ``SKIP`` are excluded with a recorded justification — the
file is the audit trail, so a skip without a reason string is a
failure.
"""

from __future__ import annotations


import json
import os
import sys
import time

ROUND = os.environ.get("SPARK_GRAFT_ROUND", "6")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NULL_SF = os.environ.get("SPARK_GRAFT_NULL_SF", "sf0.001")
SF = os.path.join(REPO, ".nulldata", NULL_SF)
_SUFFIX = "" if NULL_SF == "sf0.001" else f"_{NULL_SF}"
OUT = os.path.join(REPO, f"NULLCHECK_r{ROUND}{_SUFFIX}.json")

sys.path.insert(0, REPO)

# name -> reason. Only operator-contract exclusions belong here (the
# operator documents a non-null input requirement the fixture violates
# by design); engine-dialect divergences must be FIXED, not skipped.
SKIP: dict[str, str] = {}


def main() -> int:
    from tools.gen_nulldata import ensure_nulldata
    from tools.verify_contract import build_session, load_entry

    ensure_nulldata()  # regenerates on generator-version mismatch too
    # driver-identical session + entry loading, shared with the
    # correctness gate so the two can never drift in engine config
    spark = build_session()
    m = load_entry()
    from tests.oracle import compare

    queries, oracle = m.queries(), m.oracle_sql()
    results, failed = {}, 0
    for name in sorted(queries):
        if name not in oracle:
            continue  # rows-only (approximate) queries: no NULL oracle
        if name in SKIP:
            results[name] = {"status": "skip", "reason": SKIP[name]}
            print(f"{name:<28} SKIP   {SKIP[name]}", flush=True)
            continue
        t0 = time.time()
        try:
            compare(queries[name](spark, SF), oracle[name], SF)
            results[name] = {"status": "match", "sec": round(time.time() - t0, 1)}
            print(f"{name:<28} MATCH  {time.time() - t0:5.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            failed += 1
            results[name] = {"status": "fail", "err": str(e)[:500]}
            print(f"{name:<28} FAIL   {str(e)[:200]}", flush=True)
    ok = sum(1 for r in results.values() if r["status"] == "match")
    print(f"RESULT: {ok} ok, {failed} failed, {len(SKIP)} skipped")
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
