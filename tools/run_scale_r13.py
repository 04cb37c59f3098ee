#!/usr/bin/env python
"""Round-13 scale evidence (SCALE_r13.md): settle q116's decade ratio.

VERDICT r12 "What's wrong" #3 / Next #2: q116 (the deliberately
independent min-label CC correctness cross-check) read 12.77x wall for
10x rows — the only decade reading outside the linear envelope — but
as a SINGLE run taken inside a documented host-throttle window
(SCALE_r12.md §3). This runner re-measures the same two cells
(tools/gen_scaledata corpora, 50k and 500k docs) MEDIAN-OF-3 at BOTH
sizes, brackets every 500k sample with the pure-CPU matmul self-probe
(bench._matmul_self_probe — a stalled reading there means host
throttle, not Spark), and records the min-label iteration count per
cell (operators.dedup.LAST_CC_ITERATIONS) so a superlinear ratio can
be attributed: more ROUNDS at 10x rows means the algorithm (diameter
growth — then q116 needs a round-bound or a gate-scale-only contract),
equal rounds at higher per-round cost means shuffle/throttle.

q148 (the star-CC production path, same declared oracle) runs the same
cells as the in-window control: its r12 decade ratio was 8.8x, so a
clean window should reproduce ~that, and a q116/q148 ratio shift
isolates the algorithm from the machine.

Usage: python tools/run_scale_r13.py   (writes .scale_r13_results.json)
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
from iceberg_cache_spark.operators import dedup as D  # noqa: E402
from tools.gen_scaledata import default_base, ensure_scaledata  # noqa: E402

from bench import run_query, settle, _matmul_self_probe  # noqa: E402

OUT = ".scale_r13_results.json"
NAMES = ("q116_dedup_clusters", "q148_dedup_clusters_star")
SIZES = (50_000, 500_000)
RUNS = 3


def main() -> None:
    spark = get_spark(app_name="scale_r13")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
    dirs = {n: ensure_scaledata(default_base(), n) for n in SIZES}
    out: dict = {"cells": {}, "matmul_floor_sec": _matmul_self_probe()}
    for name in NAMES:
        cell: dict = {}
        for n in SIZES:
            samples, iters, probes = [], [], []
            for _ in range(RUNS):
                settle(spark)
                probes.append(_matmul_self_probe(trials=1))
                t0 = time.perf_counter()
                run_query(QUERIES[name](spark, dirs[n]))
                samples.append(round(time.perf_counter() - t0, 3))
                iters.append(D.LAST_CC_ITERATIONS)
            probes.append(_matmul_self_probe(trials=1))
            cell[f"docs{n}"] = {
                "sec_median": round(statistics.median(samples), 3),
                "sec_samples": samples,
                # q148 uses the star loop (counter untouched -> q116's
                # last value); only meaningful for q116
                "cc_iterations": iters if name == NAMES[0] else None,
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
