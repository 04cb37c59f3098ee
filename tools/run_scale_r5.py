#!/usr/bin/env python
"""One-off three-decade scale measurement for round 5 (SCALE_r5.md):

- third-decade (500k-doc) cells for the round-4 additions q148
  (large-star/small-star CC clusters) and q150 (dedup apply path) —
  VERDICT r4 item 5;
- the ANN/embedding tier's first decades: q71 (LSH top-k), q73 (IVF
  probed ANN), q126 (cluster-balanced sampling) at their declared
  configs plus the production-configured embedding near-dup
  (n_planes = log2(n/64)) at 5k/50k/500k vectors — VERDICT r4 item 2.

5k/50k cells are median-of-3 with the bench's spread gate; 500k cells
are single-run (each is minutes; the lower decades carry the spread
evidence). Emits one JSON blob to stdout and .scale_r5_results.json.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

from iceberg_cache_spark.session import get_spark  # noqa: E402
from iceberg_cache_spark.plans import QUERIES  # noqa: E402
from iceberg_cache_spark.operators import similarity as S  # noqa: E402
from iceberg_cache_spark.sources.testdata import load_table as T  # noqa: E402
from tools.gen_scaledata import default_base, ensure_scaledata  # noqa: E402

from bench import run_query, settle, spread_is_ok  # noqa: E402

SIZES = (5_000, 50_000, 500_000)


def q72_scaled(n_vecs: int):
    planes = max(4, int(math.ceil(math.log2(max(n_vecs, 128) / 64))))

    def fn(spark, d):
        return S.embedding_near_dup_pairs(
            T(spark, d, "embeddings"), threshold=0.9, dim=64, n_planes=planes
        )

    return fn


def main() -> None:
    spark = get_spark(app_name="scale_r5")
    spark.range(1000).selectExpr("sum(id)").collect()
    dirs = {}
    for n in SIZES:
        t0 = time.time()
        dirs[n] = ensure_scaledata(default_base(), n)
        print(f"corpus {n}: {time.time() - t0:.0f}s", flush=True)

    probes: list[tuple[str, object]] = [
        ("q148_dedup_clusters_star", QUERIES["q148_dedup_clusters_star"]),
        ("q150_dedup_apply", QUERIES["q150_dedup_apply"]),
        ("q71_lsh_cosine_topk", QUERIES["q71_lsh_cosine_topk"]),
        ("q73_ivf_cosine_topk", QUERIES["q73_ivf_cosine_topk"]),
        ("q126_cluster_balanced_sample", QUERIES["q126_cluster_balanced_sample"]),
        # event-analytics tier (events = 10x docs rows; the corpus whose
        # burstiness exposed the q153 sliding-frame quadratic — see
        # SCALE_r5.md and operators/rolling.py)
        ("q152_sessionization", QUERIES["q152_sessionization"]),
        ("q153_rolling_window", QUERIES["q153_rolling_window"]),
        ("q156_session_funnel", QUERIES["q156_session_funnel"]),
    ]
    results: dict = {}
    for name, fn in probes:
        row = {}
        for n in SIZES:
            runs = 3 if n < 500_000 else 1
            samples = []
            for _ in range(runs):
                settle(spark)
                t0 = time.perf_counter()
                run_query(fn(spark, dirs[n]))
                samples.append(time.perf_counter() - t0)
            row[n] = {
                "sec": round(statistics.median(samples), 3),
                "spread_ok": spread_is_ok(min(samples), max(samples)),
                "runs": runs,
            }
            print(f"{name} @ {n}: {row[n]}", flush=True)
        results[name] = row
    # production-configured embedding near-dup (per-size plane count)
    row = {}
    for n in SIZES:
        fn = q72_scaled(n)
        runs = 3 if n < 500_000 else 1
        samples = []
        for _ in range(runs):
            settle(spark)
            t0 = time.perf_counter()
            run_query(fn(spark, dirs[n]))
            samples.append(time.perf_counter() - t0)
        row[n] = {
            "sec": round(statistics.median(samples), 3),
            "spread_ok": spread_is_ok(min(samples), max(samples)),
            "runs": runs,
        }
        print(f"q72_scaledplanes @ {n}: {row[n]}", flush=True)
    results["q72_embedding_near_dup_scaledplanes"] = row

    out = {
        "sizes": SIZES,
        "results": {
            k: {str(n): v for n, v in row.items()} for k, row in results.items()
        },
    }
    with open(".scale_r5_results.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
