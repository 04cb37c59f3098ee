#!/usr/bin/env python
"""Round-13 scale evidence, part 2: decade ratios for the seven NEW
queries (q194 mixture audit, q195 decontam source roll-up, q196 PII
incidence, q197 shard curriculum, q198 source overlap matrix, q199
post-scrub PII audit, q200 dedup-apply audit) on the same
gen_scaledata corpora (50k and 500k docs), median-of-3, every cell
bracketed by the pure-CPU matmul self-probe so a throttled window
can't masquerade as a plan problem (the SCALE_r13 §1 protocol).

Session-cache note: q195 (bench span set), q198 and q200 (pair graph /
CC labels) serve their shared derived frames from the session cache
after the first construction, exactly as a bench session does — each
size's FIRST sample of the first consumer pays the one-time build and
the medians read the steady state; all samples are recorded so the
cold cost stays visible.

Usage: python tools/run_scale_r13b.py  (writes .scale_r13b_results.json)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

from iceberg_cache_spark.session import get_spark  # noqa: E402
from iceberg_cache_spark.plans import QUERIES  # noqa: E402
from tools.gen_scaledata import default_base, ensure_scaledata  # noqa: E402

from bench import run_query, settle, _matmul_self_probe  # noqa: E402

OUT = ".scale_r13b_results.json"
NAMES = (
    "q194_mixture_conformance_audit",
    "q195_decontam_source_report",
    "q196_pii_incidence",
    "q197_shard_curriculum",
    "q198_source_overlap_matrix",
    "q199_pii_scrub_audit",
    "q200_dedup_apply_audit",
)
SIZES = (50_000, 500_000)
RUNS = 3


def main() -> None:
    spark = get_spark(app_name="scale_r13b")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
    dirs = {n: ensure_scaledata(default_base(), n) for n in SIZES}
    out: dict = {"cells": {}, "matmul_floor_sec": _matmul_self_probe()}
    for name in NAMES:
        cell: dict = {}
        for n in SIZES:
            samples, probes = [], []
            for _ in range(RUNS):
                settle(spark)
                probes.append(_matmul_self_probe(trials=1))
                t0 = time.perf_counter()
                run_query(QUERIES[name](spark, dirs[n]))
                samples.append(round(time.perf_counter() - t0, 3))
            probes.append(_matmul_self_probe(trials=1))
            cell[f"docs{n}"] = {
                "sec_median": round(statistics.median(samples), 3),
                "sec_samples": samples,
                "matmul_probes_sec": probes,
            }
            print(name, n, cell[f"docs{n}"], flush=True)
        cell["ratio_at_10x_rows"] = round(
            cell["docs500000"]["sec_median"]
            / max(cell["docs50000"]["sec_median"], 1e-9),
            2,
        )
        out["cells"][name] = cell
        print(name, "decade ratio", cell["ratio_at_10x_rows"], flush=True)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", OUT, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
