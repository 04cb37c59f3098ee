"""Planted-semantics tests for the round-5 declared queries (q151–q153):
hand-built inputs with known answers, independent of the fixture corpus
(q152/q153 are additionally oracle-gated by the driver)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from iceberg_cache_spark.operators import dedup as D
from iceberg_cache_spark.operators import similarity as S


def _events(spark, rows):
    """rows: (event_id, user_id, minutes_offset, value)."""
    base = dt.datetime(2024, 1, 1)
    data = [
        (eid, base + dt.timedelta(minutes=m), uid, "click", v, "{}")
        for eid, uid, m, v in rows
    ]
    return spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def _run_session(spark, df, tmp_path, name):
    """Run the declared query body against a tiny parquet dir."""
    from iceberg_cache_spark.plans import QUERIES

    d = tmp_path / name
    df.write.mode("overwrite").parquet(str(d / "events.parquet"))
    return QUERIES[name](spark, str(d))


def test_sessionization_gap_boundaries(spark, tmp_path):
    """u1: events at 0, 10, 50 min (10-min gap joins, 40-min gap
    splits — 30-min threshold); boundary case: a gap of EXACTLY 30 min
    does NOT split (strict >). u2: single event."""
    df = _events(
        spark,
        [
            (0, 1, 0, 1.0),
            (1, 1, 10, 1.0),
            (2, 1, 50, 1.0),
            (3, 1, 80, 1.0),  # exactly 30 min after event 2: same session
            (4, 2, 0, 1.0),
        ],
    )
    got = {
        (r.user_id, r.session_id): (r.n_events, r.duration_us)
        for r in _run_session(spark, df, tmp_path, "q152_sessionization").collect()
    }
    assert got == {
        (1, 1): (2, 10 * 60 * 1_000_000),
        (1, 2): (2, 30 * 60 * 1_000_000),
        (2, 1): (1, 0),
    }


def test_rolling_window_frame_edges(spark, tmp_path):
    """1-hour RANGE frame is inclusive at the trailing edge: events at
    0, 30, 90 min -> counts 1, 2, 2 (the 90-min event still sees the
    30-min one: 90-60=30)."""
    df = _events(spark, [(0, 1, 0, 1.5), (1, 1, 30, 2.5), (2, 1, 90, 3.0)])
    got = {
        r.event_id: (r.n_1h, r.sum_1h_cents)
        for r in _run_session(spark, df, tmp_path, "q153_rolling_window").collect()
    }
    # sums are BIGINT integer cents (r9): 1.5 -> 150, 2.5 -> 250, 3.0 -> 300
    assert got == {0: (1, 150), 1: (2, 400), 2: (2, 550)}


def test_rolling_window_null_values_match_declared_oracle(spark, tmp_path):
    """q153 on a NULL-bearing events fixture hash-matches its DECLARED
    DuckDB oracle — the local gate the round-5 driver red lacked: the
    fixture corpus has zero NULL `value`s, so the 0-vs-NULL all-NULL-
    frame divergence was latent. Written as a single parquet FILE (the
    driver's fixture layout) so the oracle reads the identical bytes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import ORACLE, QUERIES
    from tests.oracle import compare

    base = dt.datetime(2024, 1, 1)
    rows = [
        # u1: leading all-NULL frames, then mixed, then isolated NULL
        (0, 1, 0, None), (1, 1, 10, None), (2, 1, 30, 2.5),
        (3, 1, 200, None),
        # u2: all values NULL -> every frame all-NULL
        (4, 2, 0, None), (5, 2, 5, None),
        # u3: no NULLs at all
        (6, 3, 0, 1.0), (7, 3, 59, 2.0), (8, 3, 61, 4.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(minutes=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    d = tmp_path / "nullroll"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    res = QUERIES["q153_rolling_window"](spark, str(d))
    compare(res, ORACLE["q153_rolling_window"], str(d))
    got = {r.event_id: (r.n_1h, r.sum_1h_cents) for r in res.collect()}
    assert got[0] == (1, None) and got[1] == (2, None)  # all-NULL frames
    assert got[3] == (1, None)
    assert got[4] == (1, None) and got[5] == (2, None)  # all-NULL user
    assert got[2] == (3, 250)  # 2.5 -> 250 integer cents


def _planted_embeddings(spark):
    """3 near-identical vectors (cos ~ 1) + 2 isolated ones, two labels."""
    base = [1.0] + [0.0] * 63
    eps = [1.0, 0.001] + [0.0] * 62
    eps2 = [1.0, -0.001] + [0.0] * 62
    ortho = [0.0, 1.0] + [0.0] * 62
    ortho2 = [0.0, 0.0, 1.0] + [0.0] * 61
    rows = [
        (0, base, 0),
        (1, eps, 0),
        (2, eps2, 0),
        (3, ortho, 1),
        (4, ortho2, 1),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_semdedup_apply_planted(spark, tmp_path):
    """Cluster {0,1,2} keeps vec 0; vecs 3 and 4 are untouched."""
    from iceberg_cache_spark.plans import QUERIES

    e = _planted_embeddings(spark)
    d = tmp_path / "semdedup"
    e.write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    got = {
        r.label: (r.n_vecs, r.n_kept, r.n_dropped)
        for r in QUERIES["q151_semdedup_apply"](spark, str(d)).collect()
    }
    assert got == {0: (3, 1, 2), 1: (2, 2, 0)}


def test_semdedup_pairs_found_on_planted_near_dups(spark):
    """The q151 pair emitter finds planted near-dups in the scale
    corpus generator's embedding table (cos >= 0.9 after a 1%-noise
    copy) — the generator and operator agree on what a near-dup is."""
    import pyarrow.parquet as pq

    from tools.gen_scaledata import gen_embeddings

    tbl = gen_embeddings(300, seed=123, dup_frac=0.15)
    pdf = tbl.to_pandas()
    df = spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.embedding], int(r.label)) for r in pdf.itertuples()],
        ["vec_id", "embedding", "label"],
    )
    pairs = S.embedding_near_dup_pairs(df, threshold=0.9, dim=64, n_planes=4)
    n = pairs.count()
    assert n >= 20  # ~45 planted copies; LSH at 16 buckets finds most
    sims = [r.sim for r in pairs.collect()]
    assert all(s >= 0.9 for s in sims)


def test_normalized_dedup_catches_variants(spark, tmp_path):
    """Case / punctuation / whitespace variants collapse to one
    fingerprint; genuinely different text survives (q154)."""
    from iceberg_cache_spark.plans import QUERIES

    docs = spark.createDataFrame(
        [
            (0, "Hello, World!"),
            (1, "hello   world"),
            (2, "HELLO WORLD."),
            (3, "goodbye world"),
        ],
        ["doc_id", "text"],
    )
    d = tmp_path / "normdedup"
    docs.write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {
        r.doc_id: (r.rep_id, r.keep)
        for r in QUERIES["q154_normalized_dedup"](spark, str(d)).collect()
    }
    assert got == {0: (0, 1), 1: (0, 0), 2: (0, 0), 3: (3, 1)}


def test_session_funnel_ordered_semantics(spark, tmp_path):
    """Funnel stages are ORDER-sensitive within the session: purchase
    before the click (or click before the view) must not count; a new
    session resets the funnel."""
    rows = [
        # u1 session 1: view -> click -> purchase (full funnel)
        (0, 1, 0, "view"), (1, 1, 1, "click"), (2, 1, 2, "purchase"),
        # u2: purchase BEFORE click, click BEFORE view: only view reached
        (3, 2, 0, "purchase"), (4, 2, 1, "click"), (5, 2, 2, "view"),
        # u3 session 1: view+click; session 2 (40 min later): purchase
        # alone - funnel does NOT carry across sessions
        (6, 3, 0, "view"), (7, 3, 1, "click"), (8, 3, 45, "purchase"),
    ]
    import datetime as _dt

    base = _dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (eid, base + _dt.timedelta(minutes=m), uid, et, 1.0, "{}")
            for eid, uid, m, et in rows
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    from iceberg_cache_spark.plans import QUERIES

    d = tmp_path / "funnel"
    df.write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = {
        (r.user_id, r.session_id): (r.reached_view, r.reached_click, r.reached_purchase)
        for r in QUERIES["q156_session_funnel"](spark, str(d)).collect()
    }
    assert got == {
        (1, 1): (1, 1, 1),
        (2, 1): (1, 0, 0),
        (3, 1): (1, 1, 0),
        (3, 2): (0, 0, 0),
    }


def test_tfidf_ranks_distinctive_terms(spark, tmp_path):
    """A term unique to one doc outranks corpus-wide terms (idf=ln(N/1)
    vs ln(1)=0 for everywhere-terms)."""
    docs = spark.createDataFrame(
        [
            (0, "common common zebra"),
            (1, "common common common"),
            (2, "common yak yak"),
        ],
        ["doc_id", "text"],
    )
    from iceberg_cache_spark.plans import QUERIES

    d = tmp_path / "tfidf"
    docs.write.mode("overwrite").parquet(str(d / "documents.parquet"))
    out = QUERIES["q155_tfidf_top_terms"](spark, str(d)).collect()
    top = {r.doc_id: r.term for r in out if r.rnk == 1}
    assert top[0] == "zebra" and top[2] == "yak"
    # 'common' appears in every doc: idf = ln(1) = 0 -> never outranks
    zero = [r for r in out if r.term == "common"]
    assert all(r.score == 0.0 for r in zero)


def test_span_excision_islands_planted(spark, tmp_path):
    """q174 planted semantics: overlapping registry-span hits merge
    into ONE excision island; disjoint repeats stay separate islands;
    the masked token count is the exact interval-union length. Fixture
    (SPAN_K=5, MIN_DF=2):
      - docs 0/1 share 'a b c d e' -> registry; doc 0 also chains
        'b c d e f' with docs 3/4 -> doc 0's two hits overlap into one
        island covering tokens 0..5 (6 masked of 8);
      - doc 2 contains 'a b c d e' twice, disjoint -> 2 islands,
        10 masked of 15.
    Hash-checked against the declared DuckDB oracle on the same parquet
    plus hand asserts on the planted rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import ORACLE, QUERIES
    from tests.oracle import compare

    texts = [
        "a b c d e f g h",                    # 0
        "a b c d e x y z",                    # 1
        "z z a b c d e q q q a b c d e",      # 2
        "a b c d e f",                        # 3: carries both spans
        "b c d e f x",                        # 4
        "totally unrelated words here only",  # 5: no hits -> absent
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "source": pa.array(["t"] * len(texts)),
        }
    )
    d = tmp_path / "spanfix"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    res = QUERIES["q174_span_excision"](spark, str(d))
    compare(res, ORACLE["q174_span_excision"], str(d))
    got = {
        r.doc_id: (r.n_occ, r.n_islands, r.tokens_masked, r.n_tokens,
                   r.masked_ratio_e6)
        for r in res.collect()
    }
    assert got[0] == (2, 1, 6, 8, 750000)    # overlap merged
    assert got[2] == (2, 2, 10, 15, 666666)  # disjoint repeats
    assert 5 not in got                       # clean doc emits no row

    # q178 rewrite on the same fixture: the excised corpus itself
    res = QUERIES["q178_span_excision_rewrite"](spark, str(d))
    compare(res, ORACLE["q178_span_excision_rewrite"], str(d))
    clean = {r.doc_id: (r.text_clean, r.n_tokens, r.n_kept)
             for r in res.collect()}
    assert clean[0] == ("g h", 8, 2)          # merged island 0..5 cut
    assert clean[2] == ("z z q q q", 15, 5)   # two disjoint islands cut
    assert clean[3] == ("", 6, 0)             # fully excised -> ''
    assert clean[5] == (texts[5], 5, 5)       # clean doc passes verbatim


def test_gapfill_locf_planted(spark, tmp_path):
    """q175 planted semantics: hour buckets densify from each user's
    first to last bucket; gap rows carry n_obs=0 and the last non-NULL
    observation forward; a bucket whose only events have NULL values
    stays on the carried value; NULL-ts events are excluded; a NULL
    user_id forms its own series. Hash-checked against the declared
    oracle plus hand asserts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import ORACLE, QUERIES
    from tests.oracle import compare

    H = 3_600 * 1_000_000
    rows = [
        # (event_id, user_id, us, value)
        (0, 1, 0 * H + 100, 1.00),       # u1 bucket 0 -> 100 cents
        (1, 1, 0 * H + 200, 2.00),       # later in bucket 0 -> 200 wins
        (2, 1, 3 * H + 5, None),         # bucket 3: event with NULL value
        (3, 1, 4 * H + 5, 5.00),         # bucket 4 -> 500
        (4, 2, 2 * H, 7.25),             # u2 single bucket
        (5, None, 0, 3.00),              # NULL-user series
        (6, None, 1 * H, None),          # NULL-user bucket 1: NULL value
        (7, 3, None, 9.99),              # NULL ts: excluded entirely
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [None if r[2] is None else r[2] for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    d = tmp_path / "gapfill"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    res = QUERIES["q175_gapfill_locf"](spark, str(d))
    compare(res, ORACLE["q175_gapfill_locf"], str(d))
    got = {
        (r.user_id, r.bucket_h): (r.n_obs, r.v_cents_locf)
        for r in res.collect()
    }
    assert got[(1, 0)] == (2, 200)   # last obs in bucket wins
    assert got[(1, 1)] == (0, 200)   # gap row: carried forward
    assert got[(1, 2)] == (0, 200)
    assert got[(1, 3)] == (1, 200)   # NULL-value obs doesn't reset LOCF
    assert got[(1, 4)] == (1, 500)
    assert got[(2, 2)] == (1, 725)   # single-bucket series
    assert got[(None, 0)] == (1, 300)
    assert got[(None, 1)] == (1, 300)  # NULL-user series carries too
    assert all(u != 3 for (u, _) in got)  # NULL-ts event excluded
    assert len(got) == 5 + 1 + 2     # u1: buckets 0..4, u2: 1, NULL: 2


def test_gapfill_interpolate_planted(spark, tmp_path):
    """q176 planted semantics: gap rows take the exact integer-floored
    straight line between surrounding observations (negative slopes
    floor toward -inf on BOTH engines via the pmod idiom); buckets
    before the first / after the last observation are NULL; an observed
    bucket interpolates to its own last observation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import ORACLE, QUERIES
    from tests.oracle import compare

    H = 3_600 * 1_000_000
    rows = [
        # u1: obs at b0 (100 cents) and b4 (500) -> line 200/300/400
        (0, 1, 0 * H, 1.00), (1, 1, 4 * H, 5.00),
        # u2: negative slope 0 -> -100 over 3 buckets: floor(-33.3)=-34,
        # floor(-66.6)=-67
        (2, 2, 0 * H, 0.00), (3, 2, 3 * H, -1.00),
        # u3: leading NULL tail — first obs at b2, series starts at b0
        # (a NULL-value event at b0 extends the grid but is no obs)
        (4, 3, 0 * H, None), (5, 3, 2 * H, 9.00),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    d = tmp_path / "lerp"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    res = QUERIES["q176_gapfill_interpolate"](spark, str(d))
    compare(res, ORACLE["q176_gapfill_interpolate"], str(d))
    got = {
        (r.user_id, r.bucket_h): (r.n_obs, r.v_cents_lerp)
        for r in res.collect()
    }
    assert [got[(1, b)][1] for b in range(5)] == [100, 200, 300, 400, 500]
    assert [got[(2, b)][1] for b in range(4)] == [0, -34, -67, -100]
    assert got[(3, 0)] == (1, None)   # before first obs: NULL (n_obs=1!)
    assert got[(3, 1)] == (0, None)
    assert got[(3, 2)] == (1, 900)


def test_gapfill_outlier_span_slab_guard(spark):
    """Round-10 guard (VERDICT r9 "What's wrong" #2): one corrupt
    timestamp pair (an event in 1970 plus one in 2026) spans ~491k
    hourly buckets. The slab-chunked dense grid must (a) still emit
    the exact span+1 rows with correct LOCF/lerp values and (b) never
    materialize an array row longer than GAPFILL_SLAB."""
    from pyspark.sql import functions as F

    from iceberg_cache_spark.plans.sessions import (
        GAPFILL_SLAB,
        _explode_span,
        gapfill_interpolate,
        gapfill_locf,
    )

    rows = [
        (1, 7, "1970-01-02 00:00:00", 1.0),
        (2, 7, "2026-01-01 00:00:00", 3.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = gapfill_locf(e)
    lo, hi, n = out.agg(
        F.min("bucket_h"), F.max("bucket_h"), F.count("*")
    ).first()
    span = hi - lo
    assert span > 4 * GAPFILL_SLAB  # the fixture really is an outlier
    assert n == span + 1  # dense grid intact across slab boundaries
    # every gap row carries the 1970 observation forward; the last
    # bucket is the 2026 observation itself
    by_bucket = {
        r.bucket_h: (r.n_obs, r.v_cents_locf)
        for r in out.filter(
            F.col("bucket_h").isin(lo, lo + 1, lo + GAPFILL_SLAB, hi - 1, hi)
        ).collect()
    }
    assert by_bucket[lo] == (1, 100)
    assert by_bucket[lo + 1] == (0, 100)
    assert by_bucket[lo + GAPFILL_SLAB] == (0, 100)  # slab-2 gap row
    assert by_bucket[hi - 1] == (0, 100)
    assert by_bucket[hi] == (1, 300)

    # lerp: interior gap rows sit on the exact integer-floored line
    lerp = gapfill_interpolate(e)
    assert lerp.count() == n
    mid = lerp.filter(F.col("bucket_h") == lo + GAPFILL_SLAB).first()
    expect = 100 + (200 * GAPFILL_SLAB) // span
    assert mid.v_cents_lerp == expect

    # the guard property itself: the span explode chunks by slab index
    # — no slab group exceeds the bound, and the union is exact
    span_df = spark.createDataFrame(
        [(0, span)], "b long, e_b long"
    )
    per_slab = _explode_span(span_df).groupBy("s").count()
    agg = per_slab.agg(F.max("count"), F.sum("count")).first()
    assert agg[0] <= GAPFILL_SLAB
    assert agg[1] == n


def test_sequence_packing_planted(spark, tmp_path):
    """q179 planted semantics: concat-and-chunk placement is an exact
    global prefix sum in doc_id order — pack indices and in-pack
    offsets follow from integer division by the budget; a doc
    straddling a boundary spans both packs; empty/NULL texts occupy
    no stream positions. Hash-checked against the declared oracle on
    the same parquet plus hand asserts (PACK_TOKENS=512 -> use long
    synthetic docs to cross a boundary)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import ORACLE, QUERIES
    from iceberg_cache_spark.plans.datapipe import PACK_TOKENS
    from tests.oracle import compare

    texts = [
        "w " * 300,   # doc 0: 300 tokens -> [0, 299]
        "w " * 300,   # doc 1: 300 tokens -> [300, 599] straddles 512
        "",           # doc 2: empty -> absent
        None,         # doc 3: NULL -> absent
        "w " * 10,    # doc 4: 10 tokens -> [600, 609]
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "n_chars": pa.array(
                [len(t) if t else 0 for t in texts], pa.int64()
            ),
            "source": pa.array(["t"] * len(texts)),
        }
    )
    d = tmp_path / "packfix"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    res = QUERIES["q179_sequence_packing"](spark, str(d))
    compare(res, ORACLE["q179_sequence_packing"], str(d))
    got = {
        r.doc_id: (r.start_off, r.pack_first, r.pack_last,
                   r.packs_spanned, r.off_in_pack)
        for r in res.collect()
    }
    assert PACK_TOKENS == 512
    assert got[0] == (0, 0, 0, 1, 0)
    assert got[1] == (300, 0, 1, 2, 300)   # straddles the 512 boundary
    assert got[4] == (600, 1, 1, 1, 88)
    assert 2 not in got and 3 not in got


def test_benchmark_decontam_planted(spark, tmp_path):
    """q180 planted semantics: doc 0 (0 % 97 == 0) is the benchmark
    split; a corpus doc repeating one of its 5-token spans is flagged
    with distinct-span/bench-doc counts; a clean doc is absent; the
    benchmark doc itself never appears as contaminated."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import ORACLE, QUERIES
    from tests.oracle import compare

    texts = [
        "alpha beta gamma delta epsilon zeta",        # 0: benchmark
        "x alpha beta gamma delta epsilon y",         # 1: shares 2 spans
        "completely clean text with no overlap at",   # 2: clean
        "alpha beta gamma delta epsilon",             # 3: shares 2 spans
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "source": pa.array(["t"] * len(texts)),
        }
    )
    d = tmp_path / "deconfix"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    res = QUERIES["q180_benchmark_decontam"](spark, str(d))
    compare(res, ORACLE["q180_benchmark_decontam"], str(d))
    got = {r.doc_id: (r.n_shared_spans, r.n_bench_docs)
           for r in res.collect()}
    # doc 0's spans: 'alpha..epsilon' (i=0) and 'beta..zeta' (i=1)
    assert got[1] == (1, 1)   # contains 'alpha beta gamma delta epsilon'
    assert got[3] == (1, 1)   # the whole doc IS that span
    assert 0 not in got and 2 not in got


def test_pack_manifest_planted(spark, tmp_path):
    """q184 planted semantics: the manifest explodes q179's placement
    into per-(pack, doc-slice) rows — a boundary-straddling doc emits
    one slice per pack, in-pack positions are gap-free, and every
    slice_len sums back to the doc's n_tokens. Hash-checked against
    the declared oracle plus hand asserts (PACK_TOKENS=512)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import ORACLE, QUERIES
    from iceberg_cache_spark.plans.datapipe import PACK_TOKENS
    from tests.oracle import compare

    texts = [
        "w " * 300,   # doc 0: [0, 299] -> pack 0
        "w " * 300,   # doc 1: [300, 599] -> packs 0 and 1
        "",           # doc 2: absent
        None,         # doc 3: absent
        "w " * 10,    # doc 4: [600, 609] -> pack 1
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "n_chars": pa.array(
                [len(t) if t else 0 for t in texts], pa.int64()
            ),
            "source": pa.array(["t"] * len(texts)),
        }
    )
    d = tmp_path / "manifix"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    res = QUERIES["q184_pack_manifest"](spark, str(d))
    compare(res, ORACLE["q184_pack_manifest"], str(d))
    assert PACK_TOKENS == 512
    rows = [
        (r.pack_id, r.doc_id, r.slice_start, r.slice_len, r.pos_in_pack)
        for r in res.collect()
    ]
    assert rows == [
        (0, 0, 0, 300, 0),     # doc 0 whole in pack 0
        (0, 1, 0, 212, 300),   # doc 1 head fills pack 0 to the brim
        (1, 1, 212, 88, 0),    # doc 1 tail opens pack 1
        (1, 4, 0, 10, 88),     # doc 4 follows immediately
    ]
    # invariants: per-doc slice lengths sum to n_tokens; packs gap-free
    assert sum(s for p, doc, st, s, pos in rows if doc == 1) == 300
    for pack in {r[0] for r in rows}:
        seg = sorted((pos, s) for p, _, _, s, pos in rows if p == pack)
        cur = seg[0][0]
        for pos, s in seg:
            assert pos == cur
            cur += s


def test_decontam_rewrite_planted(spark, tmp_path):
    """q185 planted semantics: benchmark docs (doc_id % 97 == 0) are
    dropped; a corpus doc sharing a 5-token span with the benchmark
    has exactly that island excised (surrounding tokens survive); a
    clean doc passes through verbatim with was_contaminated=0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import ORACLE, QUERIES
    from tests.oracle import compare

    texts = [
        "alpha beta gamma delta epsilon zeta",        # 0: benchmark
        "x alpha beta gamma delta epsilon zeta y",    # 1: contaminated
        "completely clean text with no overlap at",   # 2: clean
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "source": pa.array(["t"] * len(texts)),
        }
    )
    d = tmp_path / "deconapp"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    res = QUERIES["q185_decontam_rewrite"](spark, str(d))
    compare(res, ORACLE["q185_decontam_rewrite"], str(d))
    got = {
        r.doc_id: (r.text_clean, r.n_tokens, r.n_kept, r.was_contaminated)
        for r in res.collect()
    }
    assert 0 not in got  # benchmark split never reaches the output
    # doc 1 shares spans 'alpha..epsilon' and 'beta..zeta' -> merged
    # island covers tokens 1..6; 'x' and 'y' survive
    assert got[1] == ("x y", 8, 2, 1)
    assert got[2] == (texts[2], 7, 7, 0)


def test_decontam_accounting_planted(spark, tmp_path):
    """q186 planted semantics: overlapping benchmark-span hits merge
    into islands with exact contaminated-token counts; the kill flag
    trips at DECON_HARD_E6 (a doc that IS the benchmark span kills,
    a long doc with one small island excises)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import ORACLE, QUERIES
    from tests.oracle import compare

    texts = [
        "alpha beta gamma delta epsilon zeta",          # 0: benchmark
        # 1: 8 tokens, merged island tokens 1..6 (6/8 = 750000 ppm) -> kill
        "x alpha beta gamma delta epsilon zeta y",
        # 2: 40 tokens, one island of 5 (125000 ppm) -> excise, not kill
        "alpha beta gamma delta epsilon " + "pad " * 35,
        "completely clean text with no overlap at",     # 3: clean
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "source": pa.array(["t"] * len(texts)),
        }
    )
    d = tmp_path / "deconacct"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    res = QUERIES["q186_decontam_accounting"](spark, str(d))
    compare(res, ORACLE["q186_decontam_accounting"], str(d))
    got = {
        r.doc_id: (r.n_occ, r.n_islands, r.tokens_contaminated,
                   r.n_tokens, r.contam_ratio_e6, r.kill_doc)
        for r in res.collect()
    }
    assert 0 not in got and 3 not in got
    assert got[1] == (2, 1, 6, 8, 750000, 1)
    assert got[2] == (1, 1, 5, 40, 125000, 0)


def test_pack_stats_planted(spark, tmp_path):
    """q187 planted semantics over the q184 fixture: pack 0 holds
    doc 0 whole plus doc 1's head (split), pack 1 holds doc 1's tail
    plus doc 4 whole; fills are 512 and 98."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import ORACLE, QUERIES
    from tests.oracle import compare

    texts = ["w " * 300, "w " * 300, "", None, "w " * 10]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "n_chars": pa.array(
                [len(t) if t else 0 for t in texts], pa.int64()
            ),
            "source": pa.array(["t"] * len(texts)),
        }
    )
    d = tmp_path / "packstats"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    res = QUERIES["q187_pack_stats"](spark, str(d))
    compare(res, ORACLE["q187_pack_stats"], str(d))
    got = {
        r.pack_id: (r.n_slices, r.n_docs, r.n_whole_docs,
                    r.n_split_slices, r.tokens_filled)
        for r in res.collect()
    }
    assert got == {
        0: (2, 2, 1, 1, 512),   # doc 0 whole + doc 1 head
        1: (2, 2, 1, 1, 98),    # doc 1 tail + doc 4 whole (88 + 10)
    }


def test_pack_manifest_slab_boundaries(spark, tmp_path, monkeypatch):
    """The q184/q187 manifest explode is slab-chunked (PACK_SLAB) so a
    corrupt mega-doc can't materialize an unbounded pack array on one
    row. Shrinking the slab to 1 pack forces every multi-pack doc
    across slab boundaries — rows and hashes must be identical to the
    declared (slab-free) oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import ORACLE, QUERIES, datapipe
    from tests.oracle import compare

    monkeypatch.setattr(datapipe, "PACK_SLAB", 1)
    texts = ["w " * 1200, "w " * 300, "w " * 10]  # doc 0 spans packs 0..2
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "source": pa.array(["t"] * len(texts)),
        }
    )
    d = tmp_path / "packslab"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    for name in ("q184_pack_manifest", "q187_pack_stats"):
        res = QUERIES[name](spark, str(d))
        compare(res, ORACLE[name], str(d))
    rows = QUERIES["q184_pack_manifest"](spark, str(d)).collect()
    # doc 0: 1200 tokens -> packs 0,1,2 (3 slices under slab=1)
    assert [r.pack_id for r in rows if r.doc_id == 0] == [0, 1, 2]
    assert sum(r.slice_len for r in rows if r.doc_id == 0) == 1200


def test_decontam_bench_df_cap(spark, tmp_path, monkeypatch):
    """Round-11 scale fix: benchmark spans held by more than
    DECON_SPAN_MAX_BDF distinct bench docs are boilerplate and must be
    dropped from the probe (their hit fan-out is B*C per span —
    measured 16.9x/decade without the cap). With the cap shrunk to 1:
    a span shared by TWO bench docs stops flagging; a span unique to
    one bench doc still does. (Spark-side asserts only: the declared
    oracle interpolates the real constant at import time.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_cache_spark.plans import QUERIES, datapipe

    common = "alpha beta gamma delta epsilon"      # in BOTH bench docs
    rare = "one two three four five"               # only in bench doc 0
    texts = {
        0: f"{common} {rare}",                     # bench (0 % 97 == 0)
        97: f"{common} filler pad words here",     # bench (97 % 97 == 0)
        1: f"x {common} y",                        # corpus: common only
        2: f"x {rare} y",                          # corpus: rare span
    }
    ids = sorted(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids]),
            "lang": pa.array(["en"] * len(ids)),
            "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
            "source": pa.array(["t"] * len(ids)),
        }
    )
    d = tmp_path / "dfcap"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    # default cap (100): both corpus docs flag
    flagged = {
        r.doc_id
        for r in QUERIES["q180_benchmark_decontam"](spark, str(d)).collect()
    }
    assert flagged == {1, 2}

    # cap 1: the two-bench-doc common span drops; the rare span stays
    monkeypatch.setattr(datapipe, "DECON_SPAN_MAX_BDF", 1)
    flagged = {
        r.doc_id
        for r in QUERIES["q180_benchmark_decontam"](spark, str(d)).collect()
    }
    assert flagged == {2}
    # and the capped bench set flows through apply: doc 1 passes
    # through verbatim, doc 2 still has the rare span excised
    res = {
        r.doc_id: r.was_contaminated
        for r in QUERIES["q185_decontam_rewrite"](spark, str(d)).collect()
    }
    assert res[1] == 0 and res[2] == 1
