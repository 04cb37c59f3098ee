#!/usr/bin/env python
"""Round-12 scale evidence (SCALE_r12.md), two probes:

A) Documents-tier 10x anchor (VERDICT r11 next-round #5): the five
   most expensive document queries — the connected-components tier
   (q148 star-CC, q158 histogram-over-shared-labels, q150 kill-path,
   q116 independent min-label CC) and the PPJoin tier (q74) — at
   50k docs (the sf0.1-documents row count) and 500k docs (10x).
   Both corpora come from tools/gen_scaledata.py's Zipf/Heaps density
   law, the same generator every prior probe used. NOTE the deliberate
   deviation from the verdict's literal "extend gen_sf1.py": sf1-style
   VERBATIM 10x replication is wrong for the dedup tier — each doc
   would gain 9 exact clones, Jaccard 1.0 between every clone pair, so
   the pair graph and the cluster structure would blow up ~100x by
   construction and the anchor would measure a degenerate corpus, not
   the operator. The density-law corpus grows vocabulary and near-dup
   density the way a real corpus does (Heaps law), which is the honest
   10x. Protocol mirrors run_scale_r11: median-of-3 at 50k, single run
   at 500k (the decade ratio, not jitter, is the question). q158 runs
   with the shared-label cache CLEARED between samples (bench.py's
   settle), so it pays its full plan cost, not q148's cache hit.

B) Hot-DOC decontamination probe (VERDICT r11 next-round #4): the
   island-merge window (plans/datapipe._merge_islands) partitions by
   doc_id, so its worst case is ONE document holding a huge fraction
   of all hit tokens. SKEWCHECK covers hot-KEY variants at suite
   scale; this drives the per-doc window itself: a mega-doc built by
   tiling one benchmark doc's text (so ~every 5-token span is a hit —
   maximal hit density, the merge's true worst case) at 100k and 500k
   tokens, appended to the 50k-doc corpus. If the merge is bounded by
   doc length (ROWS-frame running max + one aggregate — O(L log L) in
   one task), the 5x-token hot-doc cells scale ~5x; a pairwise/
   quadratic merge would read ~25x.

Usage: python tools/run_scale_r12.py   (writes .scale_r12_results.json)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from iceberg_cache_spark.session import get_spark  # noqa: E402
from iceberg_cache_spark.plans import QUERIES  # noqa: E402
from tools.gen_scaledata import default_base, ensure_scaledata  # noqa: E402

from bench import run_query, settle  # noqa: E402

OUT = ".scale_r12_results.json"

ANCHOR_NAMES = (
    "q148_dedup_clusters_star",
    "q158_cluster_size_histogram",
    "q150_dedup_apply",
    "q116_dedup_clusters",
    "q74_ppjoin_jaccard",
)
ANCHOR_SIZES = (50_000, 500_000)

HOTDOC_NAMES = (
    "q180_benchmark_decontam",
    "q185_decontam_rewrite",
    "q186_decontam_accounting",
)
HOTDOC_TOKENS = (100_000, 500_000)


def make_hotdoc_corpus(src_dir: str, n_tokens: int) -> str:
    """Copy the 50k-doc corpus and append ONE mega-doc of ``n_tokens``
    built by tiling a benchmark doc's text, so nearly every 5-token
    span of the mega-doc is a benchmark span (maximal hit density for
    the island merge). The mega-doc's id avoids the % 97 == 0 bench
    split so it lands on the corpus side."""
    dst = os.path.join(default_base(), f"hotdoc_{n_tokens}")
    marker = os.path.join(dst, "_HOTDOC.json")
    src_docs = os.path.join(src_dir, "documents.parquet")
    want = {"n_tokens": n_tokens, "src_mtime": os.stat(src_docs).st_mtime_ns}
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh) == want:
                return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    t = pq.read_table(src_docs)
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    bench_text = next(
        txt for i, txt in zip(ids, texts)
        if i is not None and i % 97 == 0 and txt
    )
    unit = bench_text.split()
    reps = -(-n_tokens // len(unit))
    mega_tokens = (unit * reps)[:n_tokens]
    mega_id = max(i for i in ids if i is not None) + 1
    if mega_id % 97 == 0:
        mega_id += 1
    mega_text = " ".join(mega_tokens)
    extra = pa.table(
        {
            "doc_id": pa.array([mega_id], pa.int64()),
            "text": pa.array([mega_text], pa.string()),
            "lang": pa.array(["en"], pa.string()),
            "source": pa.array(["hotdoc"], pa.string()),
            "n_chars": pa.array([len(mega_text)], pa.int64()),
        }
    )
    merged = pa.concat_tables([t.select(extra.column_names), extra])
    pq.write_table(merged, os.path.join(dst, "documents.parquet"))
    with open(marker, "w") as fh:
        json.dump(want, fh)
    return dst


def measure(spark, name: str, d: str, runs: int) -> float:
    samples = []
    for _ in range(runs):
        settle(spark)
        t0 = time.perf_counter()
        run_query(QUERIES[name](spark, d))
        samples.append(round(time.perf_counter() - t0, 3))
    return statistics.median(samples)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    global OUT
    if which == "--hotdoc-only":
        OUT = ".scale_r12_hotdoc.json"
    spark = get_spark(app_name="scale_r12")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
    out: dict = {"anchor": {}, "hotdoc": {}}

    base50k = ensure_scaledata(default_base(), 50_000)

    # --- B first (cheaper; fails fast if the corpus build is wrong) ---
    hot_dirs = {L: make_hotdoc_corpus(base50k, L) for L in HOTDOC_TOKENS}
    hotdoc_names = HOTDOC_NAMES if which != "--anchor-only" else ()
    for name in hotdoc_names:
        cell: dict = {"base50k_sec": measure(spark, name, base50k, 3)}
        for L, d in hot_dirs.items():
            cell[f"hotdoc{L}_sec"] = measure(spark, name, d, 3)
        inc = {
            L: round(cell[f"hotdoc{L}_sec"] - cell["base50k_sec"], 3)
            for L in HOTDOC_TOKENS
        }
        lo, hi = HOTDOC_TOKENS
        cell["incremental_sec"] = {str(L): inc[L] for L in HOTDOC_TOKENS}
        # the ratio is only meaningful when the smaller hot-doc's
        # increment clears session noise; below the floor the honest
        # reading is "the hot doc costs ~nothing", not a ratio
        cell["incremental_ratio_at_5x_tokens"] = (
            round(inc[hi] / inc[lo], 2) if inc[lo] >= 0.5 else None
        )
        out["hotdoc"][name] = cell
        print("hotdoc", name, cell, flush=True)

    # --- A: documents-tier 10x anchor ---
    anchor_names = ANCHOR_NAMES if which != "--hotdoc-only" else ()
    dirs = (
        {n: ensure_scaledata(default_base(), n) for n in ANCHOR_SIZES}
        if anchor_names
        else {}
    )
    for name in anchor_names:
        cell = {}
        for n in ANCHOR_SIZES:
            runs = 3 if n < 500_000 else 1
            cell[f"docs{n}_sec"] = measure(spark, name, dirs[n], runs)
            print("anchor", name, n, cell[f"docs{n}_sec"], flush=True)
        cell["ratio_at_10x_rows"] = round(
            cell["docs500000_sec"] / max(cell["docs50000_sec"], 1e-9), 2
        )
        out["anchor"][name] = cell

    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", OUT, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
