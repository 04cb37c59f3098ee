"""Operator semantics with planted duplicates/neighbors — covers the
LSH internals the oracle can't express (candidate generation, recall)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_cache_spark.operators import dedup as D
from iceberg_cache_spark.operators import similarity as S
from iceberg_cache_spark.operators import text as X

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one token changed
OTHER = (
    "completely unrelated text about databases and distributed query "
    "engines running on large clusters with columnar storage formats"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER), (4, BASE)], ["doc_id", "text"]
    )


def test_exact_dedup_keeps_min_id(spark, docs):
    out = D.exact_dedup(docs, ["text"], "doc_id")
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 2, 3]  # doc 4 (== doc 1) collapsed to min id 1


def test_minhash_finds_planted_near_dup(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in D.minhash_dedup_pairs(docs, threshold=0.3).collect()
    }
    assert (1, 2) in pairs  # near-dup found
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # exact dup: jaccard 1
    assert (1, 3) not in pairs and (2, 3) not in pairs  # unrelated not paired


def test_minhash_signature_deterministic_across_partitionings(spark, docs):
    sig1 = D.minhash_signatures(docs).collect()
    sig2 = D.minhash_signatures(docs.repartition(7)).collect()
    assert {r.doc_id: r.sig for r in sig1} == {r.doc_id: r.sig for r in sig2}


def test_simhash_hamming_near_dup(spark, docs):
    pairs = {(r.id_a, r.id_b): r.hamming for r in D.simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs.get((1, 4)) == 0  # identical docs: distance 0
    assert (1, 2) in pairs  # near dup within a few bits
    assert (1, 3) not in pairs


def test_ngram_jaccard_exact_values(spark, docs):
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    assert out[(1, 4)] == 1.0
    assert 0.5 < out[(1, 2)] < 1.0  # one token change, high overlap
    assert (1, 3) not in out


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        (4, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_cosine_topk_ranks_self_first(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.cosine_topk(vectors, q, k=3).orderBy("rnk").collect()
    assert [r.vec_id for r in out] == [1, 2, 4]
    assert out[0].sim == 1.0


def test_embedding_near_dup_pairs(spark, vectors):
    pairs = {
        (r.id_a, r.id_b): r.sim
        for r in S.embedding_near_dup_pairs(
            vectors, threshold=0.95, dim=4, n_planes=2
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert all({a, b} != {1, 3} for a, b in pairs)


def test_q72_planted_recall_on_fixture(spark):
    """Round-10 gate hardening (VERDICT r9 #1): the registered q72
    query must recover most of its own planted near-dup pairs on the
    real embeddings fixture — the rows-only gate row used to pass on
    an empty result. Every planted pair is identifiable by the id
    offset; recall floor matches tools/verify_contract.ROWS_ONLY_MIN."""
    from iceberg_cache_spark.plans import extensions as E

    out = E.q72(spark, "/root/testdata/sf0.001").collect()
    planted = {
        (r.id_a, r.id_b)
        for r in out
        if r.id_b >= E.Q72_PLANT_OFFSET
    }
    # each recovered planted pair pairs original i with copy i+OFFSET
    assert all(b - E.Q72_PLANT_OFFSET == a for a, b in planted)
    assert len(planted) >= 10  # 17/20 recovered at sf0.001 (LSH tier)
    for r in out:
        if r.id_b >= E.Q72_PLANT_OFFSET:
            assert r.sim >= 0.9  # genuinely near AND above threshold


def test_lsh_bucket_deterministic(spark, vectors):
    b1 = {r.vec_id: r.lsh_bucket for r in S.with_lsh_bucket(vectors, "embedding", 4, 3).collect()}
    b2 = {r.vec_id: r.lsh_bucket for r in S.with_lsh_bucket(vectors.repartition(3), "embedding", 4, 3).collect()}
    assert b1 == b2


# -- text -------------------------------------------------------------------


def test_token_count(spark):
    df = spark.createDataFrame([(1, "Hello,  World! 42"), (2, "")], ["id", "t"])
    out = {r.id: r.n for r in df.select("id", X.token_count(F.col("t")).alias("n")).collect()}
    assert out[1] == 3  # hello, world, 42


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is in that room"),
            (2, "der hund und die katze ist nicht in das haus zu"),
            (3, "le chat et la maison est une belle que des arbres"),
            (4, "xyzzy plugh qwerty"),
        ],
        ["id", "t"],
    )
    out = {r.id: r.lang for r in df.select("id", X.lang_id(F.col("t")).alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO\tWORLD  "), (4, "other")],
        ["id", "t"],
    )
    fps = {r.id: r.fp for r in df.select("id", X.fingerprint(F.col("t")).alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3] != fps[4]


# -- skew helpers -----------------------------------------------------------


def test_salted_join_matches_plain_join(spark):
    from iceberg_cache_spark.operators.skew import salted_join

    large = spark.range(0, 10_000).selectExpr("id % 3 AS k", "id AS v")  # hot keys
    medium = spark.range(0, 3).selectExpr("id AS k", "id * 100 AS w")
    plain = large.join(medium, "k").selectExpr("k", "v", "w")
    salted = salted_join(large, medium, "k").selectExpr("k", "v", "w")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_sum_matches_plain_sum(spark):
    from iceberg_cache_spark.operators.skew import salted_sum
    from pyspark.sql import functions as F2

    df = spark.range(0, 10_000).selectExpr("id % 5 AS k", "CAST(id AS DOUBLE) AS v")
    plain = {
        r.k: r.s
        for r in df.groupBy("k").agg(F2.sum(F2.col("v").cast("decimal(25,6)")).alias("s")).collect()
    }
    salted = {
        r.k: r.total
        for r in salted_sum(df, "k", F2.col("v").cast("decimal(25,6)"), "total").collect()
    }
    assert plain == salted


# -- multimodal plumbing ----------------------------------------------------


def test_multimodal_frame_sampling(spark):
    from iceberg_cache_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, "a" * 300), (2, "b" * 10), (3, "")], ["doc_id", "text"]
    )
    media = M.with_media_column(df, "text", modality="video", mime="video/mp4")
    meta = {r.doc_id: r.media_meta for r in media.collect()}
    assert meta[1].nbytes == 300 and meta[1].modality == "video"

    frames = M.sample_frames(media, frame_size=64, every_n=2)
    rows = frames.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 300 bytes -> 5 windows of 64 -> every 2nd -> 3 frames
    assert len(by_doc[1]) == 3
    assert len(by_doc[2]) == 1
    assert all(len(r.frame_bytes) <= 64 for r in rows)
    # deterministic across partitionings
    again = {(r.doc_id, r.frame_id): r.frame_hash
             for r in M.sample_frames(media.repartition(3), frame_size=64, every_n=2).collect()}
    assert {(r.doc_id, r.frame_id): r.frame_hash for r in rows} == again


def test_multimodal_decode_stub_raises(spark):
    from iceberg_cache_spark.operators.multimodal import decode_media

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_media(b"bytes", "image/png")


def test_ivf_topk_recall(spark):
    from pyspark.sql import functions as F3

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = S.ivf_centroids_from_sample(e, n_cells=8)
    assert len(cents) == 8
    q = e.filter(F3.col("vec_id") < 10).select(
        F3.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = {(r.query_id, r.vec_id) for r in S.ivf_cosine_topk(e, q, cents, k=5, n_probe=4).collect()}
    brute = {(r.query_id, r.vec_id) for r in S.cosine_topk(e, q, k=5).collect()}
    # every query finds itself, and probe recall is high on this corpus
    assert all((i, i) in ivf for i in range(10))
    assert len(ivf & brute) / len(brute) >= 0.6


def test_ppjoin_equals_bruteforce(spark, docs):
    pp = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs_ppjoin(docs, threshold_num=1, threshold_den=10).collect()
    }
    brute = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.1, max_doc_freq=10**9).collect()
    }
    assert pp == brute and (1, 4) in pp


def test_asof_join_semantics(spark):
    from iceberg_cache_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (3, 9, "d")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 101), (2, 6, 200), (1, 10, 102)],
        ["k", "t", "val"],
    )
    out = {
        r.tag: r.val
        for r in asof_join(
            left, right, "k", "k", "t", "t", value_cols=["val"]
        ).collect()
    }
    assert out["a"] == 102  # inclusive at equal time; max val on ties
    assert out["b"] == 101  # most recent (t=15), not just any earlier
    assert out["c"] is None  # right row is later than left -> no match
    assert out["d"] is None  # no rows for key 3


def test_count_min_sketch_estimates(spark):
    from iceberg_cache_spark.operators.sketch import build_count_min, estimate_count

    df = spark.createDataFrame(
        [(v,) for v in [1] * 50 + [2] * 10 + [3] * 1], ["k"]
    )
    cells = [tuple(r) for r in build_count_min(df, "k", depth=3, width=32).collect()]
    assert sum(c for _, _, c in cells) == 61 * 3  # every row counted per seed
    for value, true_freq in [(1, 50), (2, 10), (3, 1)]:
        est = estimate_count(cells, value, depth=3, width=32)
        assert est >= true_freq  # CMS never underestimates
        assert est <= true_freq + 11  # collisions bounded by other mass
    assert estimate_count(cells, 999, depth=3, width=32) <= 61


def test_quantize_int8_reconstruction(spark, vectors):
    out = S.quantize_int8(vectors).collect()
    for r in out:
        assert max(abs(c) for c in r.q_codes) == 127  # scale pins the max
        for orig, code in zip(r.embedding, r.q_codes):
            assert abs(float(orig) - code * r.q_scale / 127) <= r.q_scale / 127


def test_random_projection_shape_and_determinism(spark, vectors):
    p1 = S.random_projection(vectors, "embedding", dim=4, out_dim=3).collect()
    p2 = S.random_projection(vectors.repartition(3), "embedding", dim=4, out_dim=3).collect()
    a = {r.vec_id: (r.p0, r.p1, r.p2) for r in p1}
    b = {r.vec_id: (r.p0, r.p1, r.p2) for r in p2}
    assert a == b and len(a) == 4


# -- arrow vs fold candidate-generation parity (round 5) --------------------
#
# The arrow (numpy-matmul pandas_udf) path is the 100 TB hot path; the
# fold (Catalyst higher-order-function) path is the bit-reproducible
# reference. On the fixture they must agree exactly — a divergence means
# a real bug, not an ulp tie (random Gaussian data has no near-ties).


def test_ivf_assign_arrow_matches_fold(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = S.ivf_centroids_from_sample(e, n_cells=8)
    fold = {r.vec_id: r.ivf_cell
            for r in S.ivf_assign(e, cents, impl="fold").select("vec_id", "ivf_cell").collect()}
    arrow = {r.vec_id: r.ivf_cell
             for r in S.ivf_assign(e, cents, impl="arrow").select("vec_id", "ivf_cell").collect()}
    assert fold == arrow


def test_lsh_bucket_arrow_matches_fold(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    fold = {r.vec_id: r.lsh_bucket
            for r in S.with_lsh_bucket(e, "embedding", 64, 6, impl="fold").select("vec_id", "lsh_bucket").collect()}
    arrow = {r.vec_id: r.lsh_bucket
             for r in S.with_lsh_bucket(e, "embedding", 64, 6, impl="arrow").select("vec_id", "lsh_bucket").collect()}
    assert fold == arrow
    # empty-relation robustness of the Arrow batch path
    empty = e.filter("vec_id < 0")
    assert S.with_lsh_bucket(empty, "embedding", 64, 6, impl="arrow").count() == 0


def test_ivf_topk_arrow_matches_fold(spark):
    from pyspark.sql import functions as F3

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = S.ivf_centroids_from_sample(e, n_cells=8)
    q = e.filter(F3.col("vec_id") < 10).select(
        F3.col("vec_id").alias("query_id"), "embedding"
    )
    fold = {(r.query_id, r.vec_id, r.sim, r.rnk)
            for r in S.ivf_cosine_topk(e, q, cents, k=5, n_probe=4, impl="fold").collect()}
    arrow = {(r.query_id, r.vec_id, r.sim, r.rnk)
             for r in S.ivf_cosine_topk(e, q, cents, k=5, n_probe=4, impl="arrow").collect()}
    assert fold == arrow


def test_arrow_path_null_embedding_raises_diagnosable(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, None)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(Exception) as ei:
        S.with_lsh_bucket(df, "embedding", 2, 3, impl="arrow").collect()
    assert "NULL" in str(ei.value) and "filter nulls upstream" in str(ei.value)


def test_rolling_time_agg_matches_naive_frame(spark):
    from pyspark.sql import Window as W2

    from iceberg_cache_spark.operators.rolling import rolling_time_agg

    # dense bursts + exact boundary rows: an event exactly `width` before
    # is IN the frame, `width+1` before is OUT; equal-ts peers share frames
    rows = [
        (1, 10, 0, 1.0), (2, 10, 50, 2.0), (3, 10, 100, 4.0),
        (4, 10, 100, 8.0),          # ts peer of event 3
        (5, 10, 200, 16.0),         # frame [100,200]: events 3,4,5
        (6, 10, 301, 32.0),         # frame [201,301]: event 6 only
        (7, 20, 100, 64.0),         # other user
        (8, 20, 100, 128.0),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, us bigint, v double")
    ev = df.select("event_id", "user_id", "us", F.col("v").cast("decimal(18,2)").alias("dv"))
    got = {r.event_id: (r.n, float(r.s))
           for r in rolling_time_agg(ev, 100, cnt_out="n", sum_out="s").collect()}
    w = W2.partitionBy("user_id").orderBy("us").rangeBetween(-100, 0)
    naive = {r.event_id: (r.n, float(r.s)) for r in ev.select(
        "event_id",
        F.count("*").over(w).alias("n"),
        F.sum("dv").over(w).alias("s")).collect()}
    assert got == naive
    assert got[5] == (3, 28.0)   # boundary ts=100 included
    assert got[6] == (1, 32.0)   # ts=200 excluded from [201,301]
    # equal-ts peers share the frame; ts=0 sits exactly on the [0,100]
    # boundary and is included
    assert got[3] == got[4] == (4, 15.0)


def test_rolling_time_agg_null_values_match_sum_over(spark):
    """NULL values: COUNT(*) still counts the row, but a frame whose
    values are ALL NULL must yield a NULL sum (SUM-OVER semantics on
    both Spark and DuckDB) — the round-5 driver-red contract fix.
    Verified against Spark's own naive RANGE frame."""
    from pyspark.sql import Window as W2

    from iceberg_cache_spark.operators.rolling import rolling_time_agg

    rows = [
        (1, 10, 0, None),          # frame [−100,0]: all-NULL -> sum NULL
        (2, 10, 50, None),         # frame [−50,50]: still all-NULL
        (3, 10, 120, 4.0),         # mixed frame: NULL@50 + 4.0 -> 4.0
        (4, 10, 400, None),        # isolated all-NULL frame after reals
        (5, 20, 0, 1.0),           # other user, non-null baseline
        (6, 20, 30, None),         # mixed frame [−70,30]: sum 1.0, n 2
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, us bigint, v double"
    )
    ev = df.select(
        "event_id", "user_id", "us",
        F.col("v").cast("decimal(18,2)").alias("dv"),
    )
    got = {
        r.event_id: (r.n, None if r.s is None else float(r.s))
        for r in rolling_time_agg(ev, 100, cnt_out="n", sum_out="s").collect()
    }
    w = W2.partitionBy("user_id").orderBy("us").rangeBetween(-100, 0)
    naive = {
        r.event_id: (r.n, None if r.s is None else float(r.s))
        for r in ev.select(
            "event_id",
            F.count("*").over(w).alias("n"),
            F.sum("dv").over(w).alias("s"),
        ).collect()
    }
    assert got == naive
    assert got[1] == (1, None) and got[2] == (2, None)  # all-NULL frames
    assert got[3] == (2, 4.0)                            # NULL ignored in sum
    assert got[4] == (1, None)
    assert got[6] == (2, 1.0)


def test_rolling_time_agg_null_timestamps_peer_group(spark):
    """NULL ordering keys: SQL-standard RANGE frames give a NULL-ts row
    exactly its NULL peer group (the round-6 driver red — the probe
    construction used to zero these frames while the DuckDB oracle
    returned the peer-group aggregate). The 5-row fixture is the
    VERDICT r6 repro: two NULL-ts rows for user 10 must see n=2 and the
    sum of BOTH their values; non-NULL rows must be unaffected by the
    NULL group. Verified against Spark's own native RANGE frame AND a
    DuckDB oracle of the same query."""
    from pyspark.sql import Window as W2

    from iceberg_cache_spark.operators.rolling import rolling_time_agg

    rows = [
        (1, 10, None, 4.0),         # NULL-ts peer group of user 10 ...
        (2, 10, None, 5.0),         # ... n=2, sum=9.0 for BOTH rows
        (3, 10, 0, 1.0),            # non-NULL: frame excludes NULL group
        (4, 10, 50, 2.0),           # frame [−50,50]: rows 3,4 only
        (5, 20, None, None),        # lone NULL-ts row, NULL value:
    ]                               #   n=1, sum NULL (all-NULL frame)
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, us bigint, v double"
    )
    ev = df.select(
        "event_id", "user_id", "us",
        F.col("v").cast("decimal(18,2)").alias("dv"),
    )
    got = {
        r.event_id: (r.n, None if r.s is None else float(r.s))
        for r in rolling_time_agg(ev, 100, cnt_out="n", sum_out="s").collect()
    }
    w = W2.partitionBy("user_id").orderBy("us").rangeBetween(-100, 0)
    naive = {
        r.event_id: (r.n, None if r.s is None else float(r.s))
        for r in ev.select(
            "event_id",
            F.count("*").over(w).alias("n"),
            F.sum("dv").over(w).alias("s"),
        ).collect()
    }
    assert got == naive
    assert got[1] == (2, 9.0) and got[2] == (2, 9.0)  # NULL peer group
    assert got[3] == (1, 1.0) and got[4] == (2, 3.0)  # NULLs excluded
    assert got[5] == (1, None)

    import duckdb

    con = duckdb.connect()
    con.register("ev", df.toPandas())
    oracle = {
        int(e): (int(n), None if s is None else float(s))
        for e, n, s in con.execute(
            """SELECT event_id, COUNT(*) OVER w,
                      SUM(CAST(v AS DECIMAL(18,2))) OVER w
               FROM ev
               WINDOW w AS (PARTITION BY user_id ORDER BY us
                            RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)"""
        ).fetchall()
    }
    con.close()
    assert got == oracle


def test_decode_wav_exact_samples():
    """Baseline WAV codec (r9 de-stub): encode→decode round-trips exact
    int16 samples, stereo reshapes to (frames, channels), 8-bit decodes
    as uint8, odd trailing bytes are dropped as partial frames."""
    import numpy as np

    from iceberg_cache_spark.operators.multimodal import decode_wav, encode_wav

    pcm = np.array([0, 1, -1, 32767, -32768, 123], dtype="<i2").tobytes()
    d = decode_wav(encode_wav(pcm, sample_rate=16000))
    assert (d["modality"], d["sample_rate"], d["n_channels"], d["bits"]) == (
        "audio", 16000, 1, 16,
    )
    assert d["n_samples"] == 6
    assert d["samples"].tolist() == [0, 1, -1, 32767, -32768, 123]
    # stereo: frames x channels
    st = decode_wav(encode_wav(pcm, sample_rate=8000, n_channels=2))
    assert st["n_samples"] == 3 and st["samples"].shape == (3, 2)
    assert st["samples"].tolist() == [[0, 1], [-1, 32767], [-32768, 123]]
    # 8-bit PCM
    b8 = decode_wav(encode_wav(b"\x00\x7f\xff", sample_rate=8000, bits=8))
    assert b8["bits"] == 8 and b8["samples"].tolist() == [0, 127, 255]
    # odd byte count: partial frame dropped at encode time
    assert decode_wav(encode_wav(b"abcde"))["n_samples"] == 2


def test_decode_ppm_binary_ascii_and_comments():
    from iceberg_cache_spark.operators.multimodal import decode_ppm, encode_ppm

    raster = bytes(range(24))  # 2 rows of 4 px
    d = decode_ppm(encode_ppm(raster, width=4))
    assert (d["width"], d["height"], d["modality"]) == (4, 2, "image")
    assert d["pixels"].shape == (2, 4, 3)
    assert d["pixels"].flatten().tolist() == list(range(24))
    # P3 ASCII with a header comment
    p3 = b"P3\n# a comment\n2 1\n255\n10 20 30 40 50 60\n"
    a = decode_ppm(p3)
    assert a["pixels"].flatten().tolist() == [10, 20, 30, 40, 50, 60]
    # trailing partial row dropped at encode time
    assert decode_ppm(encode_ppm(raster + b"xy", width=4))["height"] == 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n\x00\x01")  # truncated raster


def test_decode_media_dispatch_and_env_gate():
    """decode_media sniffs magic bytes; baseline formats decode for
    real, compressed formats raise naming the env requirement — the
    in-sandbox NotImplementedError branch is now only the honest
    'this needs PIL/av' case (VERDICT r8 item 6)."""
    import pytest as _pytest

    from iceberg_cache_spark.operators.multimodal import (
        decode_media, encode_ppm, encode_wav,
    )

    assert decode_media(encode_wav(b"abcd"))["modality"] == "audio"
    assert decode_media(encode_ppm(bytes(12)))["modality"] == "image"
    with _pytest.raises(NotImplementedError, match="libraries not present"):
        decode_media(b"\x89PNG\r\n\x1a\n....", "image/png")


def test_extract_features_real_decode(spark):
    """fake=False features are computed over the DECODED stream: for a
    WAV payload nbytes is the PCM byte count (not the container size)
    and feat_hash is md5 of the PCM bytes."""
    import hashlib

    from iceberg_cache_spark.operators import multimodal as M

    pcm = b"0123456789ABCDEF"
    wav = M.encode_wav(pcm)
    ppm = M.encode_ppm(bytes(range(36)), width=3)
    df = spark.createDataFrame(
        [(1, wav), (2, ppm), (3, None)], "doc_id long, payload binary"
    )
    got = {r.doc_id: (r.nbytes, r.feat_hash)
           for r in M.extract_features(df, "doc_id", fake=False).collect()}
    assert got[1] == (len(pcm), hashlib.md5(pcm).hexdigest())
    assert got[2] == (36, hashlib.md5(bytes(range(36))).hexdigest())
    assert got[3] == (None, None)


def test_sample_frames_real_decode(spark):
    """fake=False frames window the decoded PCM stream, not the RIFF
    container — frame 0 starts at the first sample byte."""
    from iceberg_cache_spark.operators import multimodal as M

    pcm = bytes(range(100, 200))  # 100 bytes -> 50 int16 samples
    df = spark.createDataFrame(
        [(7, M.encode_wav(pcm))], "doc_id long, payload binary"
    )
    rows = sorted(
        M.sample_frames(df, frame_size=16, every_n=1, fake=False).collect(),
        key=lambda r: r.frame_id,
    )
    rebuilt = b"".join(bytes(r.frame_bytes) for r in rows)
    assert rebuilt == pcm
    assert all(len(r.frame_bytes) <= 16 for r in rows)


# -- perceptual near-dup (round 10) ----------------------------------------


def test_q177_payload_cluster_invariants():
    """Cluster members are byte-level different (exact dedup finds
    nothing) but perceptual-hash IDENTICAL (margin math holds);
    different clusters hash far apart."""
    import hashlib

    from iceberg_cache_spark.operators import multimodal as M
    from iceberg_cache_spark.plans.extensions import q177_payload

    def phash(payload):
        d = M.decode_media(payload)
        if d["modality"] == "audio":
            return M.dhash64_audio(d["samples"])
        return M.dhash64_image(d["pixels"])

    for base in (0, 4, 40, 444):  # image, audio, image, audio clusters
        payloads = [q177_payload(base + i) for i in range(4)]
        assert len({hashlib.md5(p).hexdigest() for p in payloads}) == 4
        hashes = {phash(p) for p in payloads}
        assert len(hashes) == 1  # perceptually identical
    # decorrelated across clusters (image vs image, audio vs audio)
    h0, h40 = phash(q177_payload(0)), phash(q177_payload(40))
    assert bin((h0 ^ h40) & (2**64 - 1)).count("1") > 3
    h4, h444 = phash(q177_payload(4)), phash(q177_payload(444))
    assert bin((h4 ^ h444) & (2**64 - 1)).count("1") > 3


def test_perceptual_hashes_null_payload(spark):
    from iceberg_cache_spark.operators import multimodal as M
    from iceberg_cache_spark.plans.extensions import q177_payload

    df = spark.createDataFrame(
        [(1, q177_payload(1)), (2, None)], "doc_id long, payload binary"
    )
    got = {r.doc_id: r.phash for r in M.perceptual_hashes(df).collect()}
    assert got[2] is None and got[1] is not None
    # NULL-hash rows never reach the pair join
    assert M.perceptual_near_dup_pairs(M.perceptual_hashes(df)).count() == 0


def test_hamming_band_pairs_respects_groups(spark):
    """Identical hashes in DIFFERENT groups must not pair — the group
    column is part of the bucket key, not just an output column."""
    from iceberg_cache_spark.operators.dedup import hamming_band_pairs

    df = spark.createDataFrame(
        [(1, "image", 12345), (2, "audio", 12345), (3, "image", 12345)],
        "doc_id long, modality string, phash long",
    )
    out = hamming_band_pairs(df, "doc_id", "phash", group_cols=("modality",))
    assert [(r.id_a, r.id_b, r.modality, r.hamming) for r in out.collect()] \
        == [(1, 3, "image", 0)]


def test_resize_ppm_box_mean_crop_and_passthrough(spark):
    """resize_ppm: floor box-mean on non-constant blocks, odd rasters
    crop to the divisible region, factor=1 is identity, NULL/audio
    payloads pass through as NULL rows."""
    import numpy as np

    from iceberg_cache_spark.operators import multimodal as M

    # 2x4 raster; left 2x2 block channel-0 values 1,2,3,4 -> mean 2
    # (floor of 2.5 avoided: 1+2+3+4=10 -> 10//4=2); right block all 9
    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[0, 0, 0], px[0, 1, 0], px[1, 0, 0], px[1, 1, 0] = 1, 2, 3, 4
    px[:, 2:, :] = 9
    ppm = M.encode_ppm(px.tobytes(), width=4)
    wav = M.encode_wav(b"0123456789ABCDEF")
    df = spark.createDataFrame(
        [(1, ppm), (2, None), (3, wav)], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in M.resize_ppm(df, factor=2).collect()}
    assert (out[1].width, out[1].height) == (2, 1)
    d = M.decode_ppm(bytes(out[1].payload))
    assert d["pixels"][0, 0, 0] == 2      # floor((1+2+3+4)/4)
    assert (d["pixels"][0, 1] == 9).all() # constant block exact
    assert out[2].payload is None and out[3].payload is None

    # odd dimensions crop: 3x3 -> 1x1 from the top-left 2x2
    px3 = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    ppm3 = M.encode_ppm(px3.tobytes(), width=3)
    r3 = M.resize_ppm(
        spark.createDataFrame([(7, ppm3)], "doc_id long, payload binary"),
        factor=2,
    ).first()
    assert (r3.width, r3.height) == (1, 1)
    exp = px3[:2, :2].astype(int).sum(axis=(0, 1)) // 4
    assert list(M.decode_ppm(bytes(r3.payload))["pixels"][0, 0]) == list(exp)

    # factor=1 identity
    r1 = M.resize_ppm(
        spark.createDataFrame([(8, ppm)], "doc_id long, payload binary"),
        factor=1,
    ).first()
    assert bytes(r1.payload) == ppm


def test_resample_wav_decimation_and_passthrough(spark):
    """resample_wav: stride-2 decimation halves the rate and keeps
    even-index samples exactly (16-bit path); NULL/image payloads pass
    through as NULL rows; factor=1 is identity."""
    import numpy as np

    from iceberg_cache_spark.operators import multimodal as M

    samples = np.arange(-5, 5, dtype="<i2")  # 10 samples incl. negatives
    wav = M.encode_wav(samples.tobytes(), sample_rate=8000, bits=16)
    ppm = M.encode_ppm(bytes(range(36)), width=3)
    df = spark.createDataFrame(
        [(1, wav), (2, None), (3, ppm)], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in M.resample_wav(df, factor=2).collect()}
    assert (out[1].sample_rate, out[1].n_samples) == (4000, 5)
    d = M.decode_wav(bytes(out[1].payload))
    assert list(d["samples"]) == list(samples[::2])
    assert out[2].payload is None and out[3].payload is None

    r1 = M.resample_wav(
        spark.createDataFrame([(9, wav)], "doc_id long, payload binary"),
        factor=1,
    ).first()
    assert bytes(r1.payload) == wav


def test_decode_wav_truncated_chunk_is_valueerror():
    """ADVICE r10: a RIFF payload whose fmt/size chunk is truncated used
    to escape the mapInPandas (ValueError, NotImplementedError) handlers
    as struct.error and kill the Spark task. decode_wav must wrap it as
    ValueError so bad rows never kill the job."""
    import pytest

    from iceberg_cache_spark.operators.multimodal import decode_wav, encode_wav

    good = encode_wav(b"\x01\x00\x02\x00" * 8, sample_rate=8000)
    # truncate INSIDE the fmt chunk body: header parses, unpack_from
    # on the 16-byte fmt struct hits the short buffer
    fmt_off = good.index(b"fmt ")
    bad = good[: fmt_off + 12]
    with pytest.raises(ValueError, match="truncated RIFF"):
        decode_wav(bad)
    # and a chunk whose SIZE field itself is cut off
    with pytest.raises(ValueError):
        decode_wav(good[:14])
