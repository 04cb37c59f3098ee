#!/usr/bin/env python
"""End-to-end demo: the LLM pretraining tail of the pipeline —
benchmark decontamination (find → account → apply) followed by
training-sequence packing (place → emit manifest → pack stats).

This is the round-11 tier as a user would actually chain it:

  1. q180 FIND     — which training docs share an n-gram span with the
                     held-out benchmark split?
  2. q186 ACCOUNT  — how contaminated is each (islands, exact token
                     counts, kill-vs-excise decision)?
  3. q185 APPLY    — emit the decontaminated corpus (benchmark docs
                     dropped, contaminated spans excised).
  4. q179 PLACE    — concat-and-chunk placement of the corpus token
                     stream (two-level exact prefix sum; a production
                     run would point it at the APPLY output).
  5. q184 MANIFEST — the per-(pack, doc-slice) manifest a loader reads.
  6. q187 STATS    — per-pack composition (whole vs split slices,
                     fill) for the attention-mask/efficiency report.

Run: python examples/demo_decontam_packing.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_cache_spark.plans import QUERIES
from iceberg_cache_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="demo_decontam_packing")

    print("== 1. decontamination FIND (q180): flagged docs ==")
    QUERIES["q180_benchmark_decontam"](spark, sf).show(5, truncate=False)

    print("== 2. decontamination ACCOUNT (q186): kill vs excise ==")
    QUERIES["q186_decontam_accounting"](spark, sf).show(5, truncate=False)

    print("== 3. decontamination APPLY (q185): cleaned corpus ==")
    clean = QUERIES["q185_decontam_rewrite"](spark, sf)
    clean.select("doc_id", "n_tokens", "n_kept", "was_contaminated").show(5)
    n_docs = clean.count()
    n_hit = clean.where("was_contaminated = 1").count()
    print(f"   {n_docs} training docs kept, {n_hit} had spans excised")

    print("== 4. packing PLACE (q179): stream placement ==")
    QUERIES["q179_sequence_packing"](spark, sf).show(5)

    print("== 5. packing MANIFEST (q184): loader slices ==")
    QUERIES["q184_pack_manifest"](spark, sf).show(8)

    print("== 6. packing STATS (q187): per-pack composition ==")
    stats = QUERIES["q187_pack_stats"](spark, sf)
    stats.show(5)
    stats.selectExpr(
        "count(*) AS n_packs",
        "sum(n_split_slices) AS total_split_slices",
        "min(tokens_filled) AS min_fill",
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
