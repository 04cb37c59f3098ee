"""Skew-robustness tests (round 7).

The full gate is ``tools/verify_skew.py`` (every oracle-matched query
vs DuckDB on the hot-key ``tools/gen_skewdata.py`` variant — ~86% of
rows collapsed onto each grouping/FK column's modal value,
SKEWCHECK_r7.json). This file pins the generator's contracts and the
skew-sensitive query classes, so hot-key behavior can't silently
regress between full gate runs:

- generator determinism and identity-key preservation (the uniqueness
  that total ORDER BY tiebreaks and keep-one dedup are declared over);
- the queries whose plans have explicit skew machinery (q161's salted
  two-phase top-k) or giant single partitions under skew (q152/q153
  sessionization and rolling metrics on the one hot user) hash-match
  the oracle on the skewed corpus.
"""

from __future__ import annotations

import os

import pytest

from iceberg_cache_spark.plans import ORACLE, QUERIES
from tests.oracle import compare
from tools.gen_skewdata import PLAN, SKEW_ONE_IN, ensure_skewdata

SKEW_SENSITIVE = [
    "q152_sessionization",     # one user holds ~86% of events
    "q153_rolling_window",     # rolling frame inside the hot partition
    "q156_session_funnel",
    "q161_mixture_sample",     # salted fan-out must re-merge exactly
    "q34_topk_per_group",      # per-group rank inside the hot group
    "q20_groupby_agg",         # hash agg with one dominant key
    "q17_multiway_join_agg",   # FK join through the hot customer
    "q119_domain_reweight",    # per-source weights when one source IS the corpus
]


@pytest.fixture(scope="module")
def skew_sf_dir():
    return ensure_skewdata()


@pytest.mark.parametrize("name", SKEW_SENSITIVE)
def test_skew_fixture_matches_oracle(spark, skew_sf_dir, name):
    compare(QUERIES[name](spark, skew_sf_dir), ORACLE[name], skew_sf_dir)


def test_skew_fixture_is_actually_skewed(skew_sf_dir):
    import duckdb

    con = duckdb.connect()
    top, total = con.execute(
        f"""SELECT MAX(c), SUM(c) FROM (
              SELECT COUNT(*) AS c
              FROM '{os.path.join(skew_sf_dir, "events.parquet")}'
              GROUP BY user_id)"""
    ).fetchone()
    # the modal user holds ~(1 - 1/SKEW_ONE_IN) of all events
    assert top / total > 1.0 - 1.5 / SKEW_ONE_IN


def test_skew_generator_preserves_identity_keys(skew_sf_dir):
    import duckdb

    con = duckdb.connect()
    for table, key_sql in [
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("orders", "o_orderkey"),
        ("lineitem", "l_orderkey, l_linenumber"),
    ]:
        src = f"/root/testdata/sf0.001/{table}.parquet"
        dst = os.path.join(skew_sf_dir, f"{table}.parquet")
        n_src, u_src = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT ({key_sql})) FROM '{src}'"
        ).fetchone()
        n_dst, u_dst = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT ({key_sql})) FROM '{dst}'"
        ).fetchone()
        assert (n_src, u_src) == (n_dst, u_dst), table
        # identity columns are byte-identical, not just unique
        diff = con.execute(
            f"""SELECT COUNT(*) FROM (
                  SELECT {key_sql} FROM '{src}'
                  EXCEPT SELECT {key_sql} FROM '{dst}')"""
        ).fetchone()[0]
        assert diff == 0, table


def test_skew_generator_is_deterministic(tmp_path):
    from tools.gen_skewdata import generate

    import duckdb

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    generate(dst=d1)
    generate(dst=d2)
    con = duckdb.connect()
    for table in PLAN:
        diff = con.execute(
            f"""SELECT COUNT(*) FROM (
                  SELECT * FROM '{os.path.join(d1, table + ".parquet")}'
                  EXCEPT
                  SELECT * FROM '{os.path.join(d2, table + ".parquet")}')"""
        ).fetchone()[0]
        assert diff == 0, table


def test_skew_plan_covers_every_table():
    from iceberg_cache_spark.sources.testdata import TABLE_NAMES

    assert set(PLAN) == set(TABLE_NAMES)


def test_hamming_band_join_hot_cluster(spark):
    """VERDICT r10 #7 — the media tier's skew cell: one perceptual
    cluster holding 80% of the corpus. The banded Hamming join must
    (a) stay CORRECT — within-cluster pairs all found at hamming 0,
    no cross-cluster pairs — and (b) keep its bucket keys bounded:
    the max_bucket guard drops a hot (chunk, value) bucket from
    candidate generation while small clusters are untouched, so no
    task ever materializes an unbounded bucket's pair square."""
    from iceberg_cache_spark.operators.dedup import hamming_band_pairs
    from iceberg_cache_spark.operators.multimodal import (
        encode_ppm,
        perceptual_hashes,
    )
    from iceberg_cache_spark.plans.extensions import _q177_vals

    def img(cl: int, doc_id: int) -> bytes:
        # q177's image branch with the cluster DEcoupled from doc_id:
        # cluster-keyed content, per-doc <=3 perturbation (below the
        # >=24 adjacent-luminance margin, so hashes match exactly)
        v = _q177_vals(cl, 72)
        raster = bytearray()
        for idx, vi in enumerate(v):
            for k in range(3):
                raster.append(16 + 24 * vi + (doc_id * 31 + idx * 7 + k) % 4)
        return encode_ppm(bytes(raster), width=9)

    rows = [(i, img(1000, i)) for i in range(48)]          # hot: 80%
    for c, base in ((2000, 48), (3000, 52), (4000, 56)):   # 3 cold of 4
        rows += [(i, img(c, i)) for i in range(base, base + 4)]
    cluster = {i: (1000 if i < 48 else 2000 + 1000 * ((i - 48) // 4))
               for i in range(60)}
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = perceptual_hashes(media).filter("phash IS NOT NULL")

    pairs = hamming_band_pairs(
        hashes, "doc_id", "phash", group_cols=("modality",)
    ).collect()
    assert len(pairs) == 48 * 47 // 2 + 3 * 6
    assert all(p.hamming == 0 for p in pairs)
    assert all(cluster[p.id_a] == cluster[p.id_b] for p in pairs)

    # guard cell: cap buckets BELOW the hot cluster's size — its four
    # 16-bit-chunk buckets (48 members each) drop from candidate
    # generation, the size-4 clusters pass untouched
    capped = hamming_band_pairs(
        hashes, "doc_id", "phash", group_cols=("modality",), max_bucket=40
    ).collect()
    assert len(capped) == 3 * 6
    assert all(cluster[p.id_a] == cluster[p.id_b] != 1000 for p in capped)
