"""Round-12 regression pins (VERDICT/ADVICE r11).

1. Scale-guard branch parity (ADVICE r11 #2): the round-11 guards —
   DECON_SPAN_MAX_BDF boilerplate-span cap, the
   DECON_BENCH_BROADCAST_MAX shuffle fallback, and the PACK_SLAB
   slab-chunked manifest explode — were only exercised by the
   (non-hash-checked) scale probe. Planted corpora now drive each
   branch through the full engine-vs-DuckDB hash gate:
   - 101 bench docs (doc_id multiples of 97) sharing one 5-token span
     prove both engines drop the capped span identically while a rare
     span still flags;
   - a lowered broadcast cap proves the shuffle-join fallback is
     hash-identical to the broadcast path;
   - a lowered PACK_SLAB proves slab indexes > 0 emit the identical
     manifest the oracle's unslabbed UNNEST(range()) describes.

2. One bench-side pass per decontam query (VERDICT r11 #3 / ADVICE
   r11 #1): _guarded_bench_spans persists the benchmark span set via
   the engine CacheManager, so the broadcast guard's count and the
   probe join share one computation — pinned by the InMemoryTableScan
   in the executed plan and by cross-query cache reuse.

3. NULL-doc_id triad consistency (ADVICE r11 #3): q180/q186 no longer
   report contamination for NULL-id docs that q185's keyed excision
   can never remove — the triad shares one pass-through contract.

4. README/registry count lockstep (VERDICT r11 #6): the README's
   claimed declared-query count is parsed and compared against
   len(QUERIES) so the two cannot drift when a round adds queries.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from iceberg_cache_spark.plans import ORACLE, QUERIES
from iceberg_cache_spark.plans import datapipe as dp
from tests.oracle import compare

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF001 = "/root/testdata/sf0.001"


def _write_documents(path: str, rows: list[tuple[int | None, str | None]]):
    ids = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["planted"] * len(rows), pa.string()),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )


SHARED = "alpha bravo charlie delta echo"  # one SPAN_K=5 token span
RARE = "zulu yankee xray whiskey victor"


@pytest.fixture(scope="module")
def bdf_cap_dir(tmp_path_factory) -> str:
    """101 benchmark docs (doc_id = 97*k, k=1..101) all containing the
    SHARED span (bdf=101 > DECON_SPAN_MAX_BDF=100 → capped as
    boilerplate); bench doc 97 additionally holds the RARE span
    (bdf=1 → kept). Corpus doc 1 contains only the SHARED span (must
    NOT flag), corpus doc 2 contains the RARE span (must flag)."""
    d = tmp_path_factory.mktemp("bdf_cap")
    rows: list[tuple[int | None, str | None]] = []
    for k in range(1, 102):
        extra = RARE if k == 1 else f"filler{k} pad{k}"
        rows.append((97 * k, f"{SHARED} {extra}"))
    rows.append((1, f"intro words {SHARED} outro words"))
    rows.append((2, f"before text {RARE} after text"))
    rows.append((3, "entirely clean document with no leaked content"))
    _write_documents(str(d), rows)
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "q180_benchmark_decontam",
        "q185_decontam_rewrite",
        "q186_decontam_accounting",
    ],
)
def test_bdf_cap_drops_boilerplate_span_identically(spark, bdf_cap_dir, name):
    """The >100-bench-doc span is dropped by BOTH engines; the rare
    span still hits — full hash parity on the planted corpus."""
    compare(QUERIES[name](spark, bdf_cap_dir), ORACLE[name], bdf_cap_dir)


def test_bdf_cap_semantics_on_planted_corpus(spark, bdf_cap_dir):
    """Belt-and-braces: doc 2 (rare span) is flagged, doc 1 (only the
    ubiquitous span) is not — the cap path actually engaged (the
    planted corpus would flag doc 1 too if the cap were ignored)."""
    got = {
        r.doc_id: r.n_shared_spans
        for r in QUERIES["q180_benchmark_decontam"](
            spark, bdf_cap_dir
        ).collect()
    }
    assert 2 in got and got[2] >= 1
    assert 1 not in got


def test_broadcast_guard_fallback_is_hash_identical(spark, monkeypatch):
    """Lower DECON_BENCH_BROADCAST_MAX below the bench span count: the
    guard must return the frame UNHINTED (shuffle fallback) and the
    query result must be hash-identical to the broadcast path. The cap
    is read at call time (round 12) precisely so this is testable."""
    from iceberg_cache_spark.plans.shared import _MANAGERS

    for m in _MANAGERS.values():
        m.clear()
    monkeypatch.setattr(dp, "DECON_BENCH_BROADCAST_MAX", 1)
    compare(
        QUERIES["q186_decontam_accounting"](spark, SF001),
        ORACLE["q186_decontam_accounting"],
        SF001,
    )
    for m in _MANAGERS.values():
        m.clear()


def test_maybe_broadcast_unit(spark):
    """Under the cap → broadcast hint; over → the SAME frame object
    back (no hint, no copy)."""
    small = spark.range(3)
    hinted = dp._maybe_broadcast(small, cap=10)
    assert hinted is not small  # a hint wrapper came back
    over = dp._maybe_broadcast(small, cap=2)
    assert over is small


@pytest.fixture(scope="module")
def long_doc_dir(tmp_path_factory) -> str:
    """One 3000-token doc (spans ~6 packs at PACK_TOKENS=512) plus
    short neighbours — enough packs that PACK_SLAB=2 drives slab
    index s > 0 through the manifest explode."""
    d = tmp_path_factory.mktemp("long_doc")
    long_text = " ".join(f"w{i}" for i in range(3000))
    rows = [
        (1, "short leading document"),
        (2, long_text),
        (3, "short trailing document here"),
    ]
    _write_documents(str(d), rows)
    return str(d)


@pytest.mark.parametrize("name", ["q184_pack_manifest", "q187_pack_stats"])
def test_pack_slab_branch_matches_oracle(spark, long_doc_dir, monkeypatch, name):
    """With PACK_SLAB lowered to 2, the long doc's pack range chunks
    into multiple slabs (s=0,1,2) — the emitted manifest must equal
    the oracle's single unslabbed UNNEST(range()) row-for-row."""
    monkeypatch.setattr(dp, "PACK_SLAB", 2)
    # the slab branch must actually engage: the long doc spans > 2+1
    # packs, so (p1-p0) DIV 2 >= 1 for at least one row
    spanned = {
        r.doc_id: r.packs_spanned
        for r in QUERIES["q179_sequence_packing"](spark, long_doc_dir).collect()
    }
    assert spanned[2] > 3, "planted doc must span enough packs for s>0"
    compare(QUERIES[name](spark, long_doc_dir), ORACLE[name], long_doc_dir)


def test_decontam_bench_side_is_cached_single_pass(spark):
    """VERDICT r11 #3 'done' check: the probe join's bench side reads
    the persisted frame the guard counted — InMemoryTableScan in the
    executed plan (the old shape re-derived the whole
    explode+distinct+aggregate under the BroadcastExchange), and the
    q185→q186 second consumer reuses the same cache entry."""
    from iceberg_cache_spark.plans.shared import _MANAGERS, corpus_cache

    for m in _MANAGERS.values():
        m.clear()
    df = QUERIES["q186_decontam_accounting"](spark, SF001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, (
        "bench side not served from the persisted guard frame:\n" + plan
    )
    mgr = corpus_cache(spark)
    stats_before = mgr.stats()
    QUERIES["q185_decontam_rewrite"](spark, SF001)  # same span-only shape
    stats_after = mgr.stats()
    assert stats_after["hits"] > stats_before["hits"], (
        "q185 did not reuse q186's cached bench span set"
    )
    for m in _MANAGERS.values():
        m.clear()


@pytest.fixture(scope="module")
def null_id_dir(tmp_path_factory) -> str:
    """A NULL-doc_id doc carrying a benchmark span: the triad must
    treat it as pass-through everywhere (no find flag, no accounting
    row, apply passes it verbatim)."""
    d = tmp_path_factory.mktemp("null_id")
    rows = [
        (97, f"{SHARED} unique bench filler"),  # the benchmark doc
        (None, f"null id doc with {SHARED} inside"),  # NULL-id corpus doc
        (5, f"normal corpus doc with {SHARED} inside"),  # keyed corpus doc
    ]
    _write_documents(str(d), rows)
    return str(d)


def test_null_doc_id_triad_contract(spark, null_id_dir):
    """One contract across find/account/apply (ADVICE r11 #3): the
    keyed corpus doc is flagged+accounted+excised; the NULL-id doc is
    flagged NOWHERE and passes through apply unexcised."""
    find = {
        r.doc_id
        for r in QUERIES["q180_benchmark_decontam"](spark, null_id_dir).collect()
    }
    acct = {
        r.doc_id
        for r in QUERIES["q186_decontam_accounting"](
            spark, null_id_dir
        ).collect()
    }
    assert find == {5} and acct == {5}
    apply_rows = {
        r.doc_id: r
        for r in QUERIES["q185_decontam_rewrite"](spark, null_id_dir).collect()
    }
    assert apply_rows[5].was_contaminated == 1
    assert apply_rows[5].n_kept < apply_rows[5].n_tokens
    null_row = apply_rows[None]
    assert null_row.was_contaminated == 0
    assert null_row.n_kept == null_row.n_tokens  # passed through verbatim
    # and the oracle agrees on the whole fixture
    for name in (
        "q180_benchmark_decontam",
        "q185_decontam_rewrite",
        "q186_decontam_accounting",
    ):
        compare(QUERIES[name](spark, null_id_dir), ORACLE[name], null_id_dir)


def test_readme_query_count_matches_registry():
    """VERDICT r11 #6: the README's '<N> declared queries' claim is
    parsed and pinned to len(QUERIES) so prose and registry cannot
    drift when a round adds queries."""
    with open(os.path.join(REPO, "README.md")) as fh:
        readme = fh.read()
    m = re.search(r"(\d+) declared queries", readme)
    assert m, "README no longer states the declared-query count"
    assert int(m.group(1)) == len(QUERIES), (
        f"README claims {m.group(1)} declared queries; registry has "
        f"{len(QUERIES)} — update README.md"
    )


@pytest.fixture(scope="module")
def multi_island_dir(tmp_path_factory) -> str:
    """A corpus doc with MANY disjoint excision islands — the gap-walk
    rewrite's interesting path (round 12 replaced the O(tokens x
    islands) membership lambda after the hot-doc probe measured the
    old shape at 823 s on a 9k-island mega-doc; the planted corpus
    exercises multi-island gap slicing at test cost). Bench doc 97
    carries 8 separate 5-token spans; corpus doc 3 interleaves each
    span between unique filler, yielding 8 disjoint islands, including
    one at position 0 and one at the exact tail."""
    d = tmp_path_factory.mktemp("multi_island")
    leak = [f"leak{j}a leak{j}b leak{j}c leak{j}d leak{j}e" for j in range(8)]
    bench_text = " xx yy ".join(leak)
    corpus_tokens: list[str] = []
    for j, span in enumerate(leak):
        if j > 0:
            corpus_tokens.extend([f"gapA{j}", f"gapB{j}", f"gapC{j}"])
        corpus_tokens.append(span)
    head_text = " ".join(corpus_tokens)            # island at pos 0 + tail
    mid_text = "start pad " + head_text + " tail pad"  # islands interior
    rows = [
        (97, bench_text),
        (3, head_text),
        (5, mid_text),
        (7, "clean document nothing leaked here at all"),
    ]
    _write_documents(str(d), rows)
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "q185_decontam_rewrite",
        "q186_decontam_accounting",
        "q178_span_excision_rewrite",
    ],
)
def test_multi_island_gap_walk_matches_oracle(spark, multi_island_dir, name):
    compare(QUERIES[name](spark, multi_island_dir), ORACLE[name], multi_island_dir)


def test_multi_island_semantics(spark, multi_island_dir):
    """The planted doc really produced multiple islands and the
    gap-walk excised exactly the leaked spans (boundary islands at
    position 0 and the array tail included)."""
    acct = {
        r.doc_id: r
        for r in QUERIES["q186_decontam_accounting"](
            spark, multi_island_dir
        ).collect()
    }
    assert acct[3].n_islands >= 6, acct[3]
    rew = {
        r.doc_id: r
        for r in QUERIES["q185_decontam_rewrite"](
            spark, multi_island_dir
        ).collect()
    }
    assert rew[3].was_contaminated == 1
    assert "leak0a" not in rew[3].text_clean
    assert "gapa1" in rew[3].text_clean  # inter-island filler survives (tokenizer lowercases)
    assert rew[5].text_clean.startswith("start pad")
    assert rew[5].text_clean.endswith("tail pad")
    assert rew[7].text_clean == "clean document nothing leaked here at all"
