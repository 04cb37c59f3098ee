"""Round-13 new-query semantics pins (q194–q200).

Each new query gets a PLANTED fixture whose expected output is
recomputed in straight Python (the q191 discipline —
tests/test_round13_fixes.py §3), plus a hash-match against its DuckDB
oracle on the same fixture, so both the Spark plan and the SQL twin
are pinned to hand-checkable numbers:

- q194 mixture conformance audit: the q191 mix fixture's realized
  shares/deviations are computed by hand from the md5-uniform keep
  set (5/8 big docs kept at rate 0.5, small upsampled 20x).
- q195 per-source contamination roll-up: one bench doc (id 97), two
  feeds with one contaminated doc each, a NULL-source contaminated
  doc (excluded by contract) and a NULL-id doc (passes unflagged).
- q196 PII incidence: planted emails / digit runs per source,
  including NULL text (zero matches) and the NULL-source group.
- q197 shard curriculum: structural pins at sf0.001 — ranks are a
  permutation, tokens_filled reconciles EXACTLY with q189's shard
  manifest, and rank order equals mean_quality_e4 descending.
- q198 source overlap matrix: planted cross-feed / intra-feed /
  NULL-source-endpoint duplicate pairs -> exact matrix.
- q199 post-scrub PII audit: adversarial adjacency fixtures (digits
  flanking emails, mask-literal joins) — raw report non-zero, audit
  all-clear with real n_docs.
- q200 dedup-apply audit: zero surviving duplicate pairs among the
  keep-min survivors, proven from the edges on the overlap fixture.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_cache_spark.plans import QUERIES, ORACLE
from tests.oracle import compare
from tests.test_round13_fixes import _write_mix_documents

SF001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# q194 — mixture conformance audit on the q191 planted corpus
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mix_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("mix_audit")
    _write_mix_documents(str(d))
    return str(d)


def test_q194_planted_realized_shares_exact(spark, mix_dir):
    # Hand-derivation: tokens big=800 small=20 empty=0 NULL=780,
    # total=1600, n_sources=4. rate(big)=500000 keeps 5 of 8 docs at
    # 1 epoch (the pinned md5 keep set {100,102,105,106,107});
    # rate(small)=20e6 keeps both docs at 20 epochs. Realized tokens:
    # big 5*100=500, small 2*20*10=400, total 900.
    rows = {
        r.source: r
        for r in QUERIES["q194_mixture_conformance_audit"](
            spark, mix_dir
        ).collect()
    }
    assert set(rows) == {"big", "small"}  # rate-0 + NULL sources absent
    big, small = rows["big"], rows["small"]
    assert (big.realized_docs, big.realized_rows, big.realized_tokens) == (
        5, 5, 500,
    )
    assert (
        small.realized_docs, small.realized_rows, small.realized_tokens
    ) == (2, 40, 400)
    assert big.realized_share_e6 == 500 * 1_000_000 // 900  # 555555
    assert small.realized_share_e6 == 400 * 1_000_000 // 900  # 444444
    assert big.target_share_e6 == small.target_share_e6 == 250_000
    assert big.dev_e6 == 555_555 - 250_000
    assert small.dev_e6 == 444_444 - 250_000


def test_q194_planted_hash_matches_oracle(spark, mix_dir):
    compare(
        QUERIES["q194_mixture_conformance_audit"](spark, mix_dir),
        ORACLE["q194_mixture_conformance_audit"],
        mix_dir,
    )


# ---------------------------------------------------------------------------
# q195 — per-source contamination roll-up
# ---------------------------------------------------------------------------


def _write_leak_documents(path: str) -> None:
    rows = [
        # bench doc (97 % 97 == 0): spans {"a b c d e", "b c d e f"}
        (97, "benchfeed", "a b c d e f"),
        # feedA: one contaminated doc (carries "a b c d e"), one clean
        (1, "feedA", "x a b c d e y"),
        (2, "feedA", "p q r s t u"),
        # feedB: contaminated via the second bench span
        (3, "feedB", "b c d e f z"),
        # NULL source, contaminated: excluded from the report entirely
        (4, None, "a b c d e q"),
        # NULL doc_id, contaminated text: passes through unflagged
        (None, "feedA", "a b c d e"),
    ]
    texts = [r[2] for r in rows]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )


@pytest.fixture(scope="module")
def leak_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("leak_report")
    _write_leak_documents(str(d))
    return str(d)


def test_q195_planted_per_feed_rollup_exact(spark, leak_dir):
    rows = {
        r.source: r
        for r in QUERIES["q195_decontam_source_report"](
            spark, leak_dir
        ).collect()
    }
    # NULL-source doc 4 is contaminated but has no feed: excluded.
    assert set(rows) == {"feedA", "feedB"}
    a, b = rows["feedA"], rows["feedB"]
    assert (a.n_docs, a.n_flagged_docs) == (2, 1)
    assert (a.n_leaked_spans, a.n_occurrences) == (1, 1)
    assert a.flagged_ppm == 500_000
    assert (b.n_docs, b.n_flagged_docs) == (1, 1)
    assert (b.n_leaked_spans, b.n_occurrences) == (1, 1)
    assert b.flagged_ppm == 1_000_000


def test_q195_planted_hash_matches_oracle(spark, leak_dir):
    compare(
        QUERIES["q195_decontam_source_report"](spark, leak_dir),
        ORACLE["q195_decontam_source_report"],
        leak_dir,
    )


# ---------------------------------------------------------------------------
# q196 — PII incidence
# ---------------------------------------------------------------------------


def _write_pii_documents(path: str) -> None:
    rows = [
        (1, "A", "contact me@example.com for details"),
        (2, "A", "perfectly clean prose"),
        (3, "B", "123456 7890123 x"),   # two long digit runs, one doc
        (4, "B", None),                  # NULL text: zero matches
        (5, None, "a@b.cc 999999"),      # NULL source keeps its group
    ]
    texts = [r[2] for r in rows]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("pii_report")
    _write_pii_documents(str(d))
    return str(d)


def test_q196_planted_incidence_exact(spark, pii_dir):
    rows = {
        r.source: r
        for r in QUERIES["q196_pii_incidence"](spark, pii_dir).collect()
    }
    assert set(rows) == {"A", "B", None}
    a, b, n = rows["A"], rows["B"], rows[None]
    assert (a.n_docs, a.docs_with_email, a.email_matches) == (2, 1, 1)
    assert (a.docs_with_number, a.number_matches) == (0, 0)
    assert a.pii_docs_ppm == 500_000
    assert (b.n_docs, b.docs_with_number, b.number_matches) == (2, 1, 2)
    assert (b.docs_with_email, b.email_matches) == (0, 0)
    assert b.pii_docs_ppm == 500_000
    assert (n.n_docs, n.docs_with_email, n.docs_with_number) == (1, 1, 1)
    assert n.pii_docs_ppm == 1_000_000


def test_q196_planted_hash_matches_oracle(spark, pii_dir):
    compare(
        QUERIES["q196_pii_incidence"](spark, pii_dir),
        ORACLE["q196_pii_incidence"],
        pii_dir,
    )


# ---------------------------------------------------------------------------
# q197 — shard curriculum
# ---------------------------------------------------------------------------


def test_q197_ranks_are_quality_order_and_reconcile_with_q189(spark):
    cur = QUERIES["q197_shard_curriculum"](spark, SF001).collect()
    assert cur, "sf0.001 fills at least one shard"
    # curriculum_rank is a permutation of 1..n
    assert sorted(r.curriculum_rank for r in cur) == list(
        range(1, len(cur) + 1)
    )
    # rank order == mean_quality_e4 descending (shard_id tiebreak)
    by_rank = sorted(cur, key=lambda r: r.curriculum_rank)
    assert [r.shard_id for r in by_rank] == [
        r.shard_id
        for r in sorted(cur, key=lambda r: (-r.mean_quality_e4, r.shard_id))
    ]
    # quality is e4 fixed point in [0, 10000]
    assert all(0 <= r.mean_quality_e4 <= 10_000 for r in cur)
    # tokens_filled and n_docs reconcile EXACTLY with the shard
    # manifest (same placement, independent aggregation path)
    mf = {
        r.shard_id: r
        for r in QUERIES["q189_shard_manifest"](spark, SF001).collect()
    }
    assert set(mf) == {r.shard_id for r in cur}
    for r in cur:
        assert r.tokens_filled == mf[r.shard_id].tokens_filled
        assert r.n_docs == mf[r.shard_id].n_docs


def test_quality_score_e4_is_exactly_10000x_quality(spark):
    """The e4 form and the certified double form must be the same
    number — pin on the real corpus, not a synthetic row."""
    from pyspark.sql import functions as F
    from iceberg_cache_spark.operators import text as X
    from iceberg_cache_spark.sources.testdata import load_table as T

    d = T(spark, SF001, "documents").limit(500)
    bad = d.select(
        X.quality_score(F.col("text")).alias("q"),
        X.quality_score_e4(F.col("text")).alias("q_e4"),
    ).where(
        F.abs(F.col("q") * 10000 - F.col("q_e4")) > 1e-6
    )
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# q198 — cross-source duplication matrix
# ---------------------------------------------------------------------------


def _write_overlap_documents(path: str) -> None:
    dup1 = "alpha beta gamma delta epsilon zeta eta theta"
    dup2 = "one two three four five six seven eight nine"
    dup3 = "red orange yellow green blue indigo violet"
    rows = [
        (1, "A", dup1),            # cross-feed pair with doc 2
        (2, "B", dup1),
        (3, "B", dup2),            # intra-B pair with doc 4
        (4, "B", dup2),
        (5, None, dup3),           # NULL-source endpoint: pair dropped
        (6, "A", dup3),
        (7, "A", "completely unrelated text with its own tokens"),
    ]
    texts = [r[2] for r in rows]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )


@pytest.fixture(scope="module")
def overlap_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("overlap_matrix")
    _write_overlap_documents(str(d))
    return str(d)


def test_q198_planted_matrix_exact(spark, overlap_dir):
    rows = {
        (r.source_a, r.source_b): r.n_pairs
        for r in QUERIES["q198_source_overlap_matrix"](
            spark, overlap_dir
        ).collect()
    }
    # cross-feed A<->B once, intra-B once; the NULL-source pair 5~6
    # is dropped (no feed to attribute)
    assert rows == {("A", "B"): 1, ("B", "B"): 1}


def test_q198_planted_hash_matches_oracle(spark, overlap_dir):
    compare(
        QUERIES["q198_source_overlap_matrix"](spark, overlap_dir),
        ORACLE["q198_source_overlap_matrix"],
        overlap_dir,
    )


# ---------------------------------------------------------------------------
# q199 — post-scrub PII audit
# ---------------------------------------------------------------------------


def _write_scrub_documents(path: str) -> None:
    rows = [
        # adjacency traps: digits flanking an email (consumed into the
        # email match by the greedy classes), digit runs split by the
        # mask literal, multiple emails
        (1, "A", "123456a@b.cd and x@y.zz99999 tail"),
        (2, "A", "12345 and 54321 stay (sub-threshold)"),
        (3, "B", "run 1234567 then 890123456 end"),
        (4, "B", None),
        (5, None, "edge a@@b and 999999"),
    ]
    texts = [r[2] for r in rows]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )


@pytest.fixture(scope="module")
def scrub_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("scrub_audit")
    _write_scrub_documents(str(d))
    return str(d)


def test_q199_planted_all_clear_and_nonvacuous(spark, scrub_dir):
    # the raw report is NON-zero on this fixture (the audit's
    # non-vacuity witness) ...
    raw = {
        r.source: r
        for r in QUERIES["q196_pii_incidence"](spark, scrub_dir).collect()
    }
    # raw counts are independent per pattern: doc 1's leading "123456"
    # is both inside the email match AND a standalone digit run
    assert raw["A"].email_matches == 2 and raw["A"].number_matches == 1
    assert raw["B"].number_matches == 2
    assert raw[None].email_matches == 0  # 'a@@b' is not an email
    assert raw[None].number_matches == 1
    # ... and the post-scrub audit reads all-clear with real n_docs
    audit = {
        r.source: r
        for r in QUERIES["q199_pii_scrub_audit"](spark, scrub_dir).collect()
    }
    assert set(audit) == {"A", "B", None}
    for r in audit.values():
        assert r.n_docs > 0
        assert (
            r.docs_with_email, r.docs_with_number,
            r.email_matches, r.number_matches, r.pii_docs_ppm,
        ) == (0, 0, 0, 0, 0)


def test_q199_planted_hash_matches_oracle(spark, scrub_dir):
    compare(
        QUERIES["q199_pii_scrub_audit"](spark, scrub_dir),
        ORACLE["q199_pii_scrub_audit"],
        scrub_dir,
    )


# ---------------------------------------------------------------------------
# q200 — dedup-apply audit
# ---------------------------------------------------------------------------


def test_q200_planted_audit_exact(spark, overlap_dir):
    # overlap fixture pairs: (1,2), (3,4), (5,6); min-id keep drops
    # {2,4,6}; doc 7 is a singleton. The audit must read zero
    # surviving pairs with the real totals.
    row = QUERIES["q200_dedup_apply_audit"](spark, overlap_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.n_docs, r.n_kept, r.n_dropped) == (7, 4, 3)
    assert r.surviving_dup_pairs == 0


def test_q200_planted_hash_matches_oracle(spark, overlap_dir):
    compare(
        QUERIES["q200_dedup_apply_audit"](spark, overlap_dir),
        ORACLE["q200_dedup_apply_audit"],
        overlap_dir,
    )
