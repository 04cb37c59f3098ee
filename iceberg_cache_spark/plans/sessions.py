"""Round-5 additions: event-stream batch analytics + the embedding
dedup kill path.

- q151: SemDeDup-style apply — embedding near-dup clusters (LSH
  candidates + exact-decimal cosine rescore, threshold 0.9) collapse to
  the min-vec_id representative; per-label corpus-reduction report.
  Completes the embedding tier's find→decide→apply story the text tier
  already has (q116/q148 → q150). Rows-only by SURVEY determinism rules
  (LSH candidate sets are config-dependent); semantics pinned by
  planted-near-dup unit tests on the clustered-Gaussian scale corpus.
- q152: gap-based sessionization of the events table (30-minute
  inactivity gap) — the batch counterpart of the streaming session
  window (q81): lag + cumulative-sum session ids, per-session stats.
  Exact oracle (integer microsecond arithmetic both sides).
- q153: per-user 1-hour rolling RANGE-frame aggregates over event time
  — the time-series rolling metric every event pipeline ships. The
  frame is on integer epoch-microseconds and the rolling sum is
  DECIMAL-exact, so the oracle hash-matches despite per-row frames.

ref parity: the reference has no event analytics; these extend SURVEY
§2's "beyond ref" tier (time-series + dedup-apply operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from iceberg_cache_spark.operators import dedup as _D
from iceberg_cache_spark.operators import similarity as _S
from iceberg_cache_spark.operators.text import tokens as _tokens
from iceberg_cache_spark.plans.extensions import _DUCK_TOKS
from iceberg_cache_spark.plans.registry import declared
from iceberg_cache_spark.sources.testdata import load_table as T

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min
ROLL_US = 3_600 * 1_000_000  # 1 h


@declared("q151_semdedup_apply")  # rows-only: LSH candidate generation
def q151(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup KILL path: cosine>=0.9 pair graph (LSH
    buckets + exact decimal rescore, q72's emitter) -> star-contraction
    connected components -> drop all but the min-vec_id representative
    -> per-label reduction report. One anti-join of the (small) dropped
    set against the scan; the corpus is never rescanned per cluster —
    the same apply shape as q150, in embedding space."""
    e = T(spark, sf, "embeddings")
    pairs = _S.embedding_near_dup_pairs(
        e, threshold=0.9, dim=64, n_planes=4
    ).select("id_a", "id_b")
    clusters = _D.connected_components_star(pairs)
    dropped = clusters.filter(F.col("id") != F.col("cid")).select(
        F.col("id").alias("vec_id")
    )
    flagged = e.join(dropped.withColumn("_drop", F.lit(1)), "vec_id", "left")
    return (
        flagged.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.count(F.when(F.col("_drop").isNull(), 1))
            .cast("bigint")
            .alias("n_kept"),
            F.count(F.when(F.col("_drop").isNotNull(), 1))
            .cast("bigint")
            .alias("n_dropped"),
        )
        .orderBy("label")
    )


# one oracle text for both sessionization plans (q152 single-window,
# q167 skew-chunked): declared semantics identical, physical plan differs.
_SESS_ORACLE = f"""WITH ev AS (
         SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
       gaps AS (
         SELECT user_id, event_id, us,
                CASE WHEN us IS NULL
                       OR us - LAG(us) OVER w > {SESSION_GAP_US}
                       OR LAG(us) OVER w IS NULL
                     THEN 1 ELSE 0 END AS new_sess
         FROM ev WINDOW w AS (PARTITION BY user_id
                              ORDER BY us NULLS LAST, event_id)),
       sess AS (
         SELECT user_id, event_id, us,
                CAST(SUM(new_sess) OVER (PARTITION BY user_id
                     ORDER BY us NULLS LAST, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         FROM gaps)
       SELECT user_id, session_id,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              MIN(us) AS start_us, MAX(us) AS end_us,
              MAX(us) - MIN(us) AS duration_us
       FROM sess GROUP BY user_id, session_id
       ORDER BY user_id, session_id"""


@declared("q152_sessionization", _SESS_ORACLE)
def q152(spark: SparkSession, sf: str) -> DataFrame:
    """Gap sessionization: a session breaks after 30 min of user
    inactivity. lag -> boundary flag -> running sum = session id ->
    per-session aggregate. Two window passes + one hash aggregate, all
    partitioned by user_id — at 100 TB this is one shuffle on the user
    key (both windows and the groupBy share it; Catalyst reuses the
    exchange), no driver state, skew bounded by the hottest user.

    NULL event times: an event with unknown time is its own session
    (us IS NULL forces a boundary; NULLS LAST ordering is explicit on
    both sides — the engines' ASC NULL defaults differ, r7 NULL gate).

    The plan body lives in ``operators/sessionize.py::sessionize_default``
    (extracted r8 so ``sessionize_auto`` delegates to the identical
    expressions)."""
    from iceberg_cache_spark.operators.sessionize import sessionize_default

    e = T(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = e.select("user_id", "event_id", us.alias("us"))
    s = sessionize_default(ev, SESSION_GAP_US)
    return s.select(
        "user_id",
        "session_id",
        "n_events",
        "start_us",
        "end_us",
        (F.col("end_us") - F.col("start_us")).alias("duration_us"),
    ).orderBy("user_id", "session_id")


# one oracle text for both rolling-window plans (q153 unchunked,
# q166 skew-chunked): the DECLARED semantics are identical, only the
# physical decomposition differs.
#
# DECLARED SEMANTICS (value derivation revised r9, frame unchanged
# since r5): per-event COUNT(*) and SUM(dvc) over the same-user
# inclusive [us - 1h, us] integer-µs frame, peer-inclusive at ties,
# SQL NULL-peer-group frame for NULL us — i.e. exactly
# `COUNT(*)/SUM(dvc) OVER (PARTITION BY user_id ORDER BY us RANGE
# BETWEEN 3600000000 PRECEDING AND CURRENT ROW)` where
# `dvc = CAST(FLOOR(value * 100.0) AS BIGINT)` — integer cents.
#
# VALUE DERIVATION (rewritten r9): r8's one-construct probes settled a
# three-round investigation — q169 (RANGE frame alone) and q171
# (epoch_us alone) came back driver-GREEN while q170 (`CAST(value AS
# DECIMAL(18,2))` as a bare identity projection) came back driver-RED
# (CORRECTNESS_r08.json). The double→DECIMAL cast's half-rounding rule
# differs between Spark and the driver's DuckDB build (local DuckDB
# 1.0.0 agrees with Spark, which is why every local gate was green).
# So the hash path no longer casts through DECIMAL anywhere: the value
# enters the pipeline as BIGINT integer cents via FLOOR(value * 100.0)
# — ONE IEEE-754 double multiply (bit-identical on any IEEE engine,
# and a single operation, so not even FMA contraction can perturb it)
# followed by an exact floor — and every sum stays in BIGINT end to
# end. The output column is `sum_1h_cents BIGINT`. No engine-specific
# rounding rule is exercised on either side.
#
# PRECISION CAVEAT (ADVICE r9): the cents are floor-OF-THE-DOUBLE, not
# floor-of-the-nominal-decimal — e.g. 2.67 is stored as 2.6699999...,
# so dvc = 266, one cent below nominal. That is the point: parity, not
# decimal exactness — both engines floor the SAME IEEE double. Also,
# a NaN/Inf `value` would diverge (DuckDB hard-errors the CAST, Spark
# clamps); the fixtures carry only finite doubles and NULLs, and
# tests/test_roll_oracle.py::test_cents_derivation_engine_portable
# pins the adversarial finite cases (half-cent boundaries, one-ulp
# straddles, negatives). If adversarial value injection is ever
# extended beyond NULLs, add an `isfinite(value)` guard on BOTH sides
# before this derivation.
#
# FORMULATION (rewritten r8): the frame is computed via the engine's
# own prefix-sum decomposition (operators/rolling.py design) using
# only constructs with green driver history: GROUP BY, UNION ALL, one
# ROWS UNBOUNDED PRECEDING cumulative window with explicit ordering +
# tiebreak, equi-joins on non-null keys, CASE.
#   - per-(user, us) peer-group totals (GROUP BY makes peer
#     inclusivity structural instead of relying on RANGE peer frames);
#   - each time-group also emits a zero-weight probe at us - w - 1;
#     cumulative sums ordered by (t, is_probe) put the probe AFTER a
#     real group at the same t, so prefix(probe) = rows with t' <= us-w-1;
#   - frame value = prefix(real) - prefix(probe)  ⇒  t' ∈ [us-w, us];
#   - SUM's NULL contract via a non-null-value counter (cs): frame sum
#     is NULL iff the frame holds no non-NULL dv;
#   - NULL-us rows take their SQL peer-group frame from a direct
#     GROUP BY over the NULL slice;
#   - `uk` is an injective non-null surrogate of user_id so every join
#     and window partition is NULL-safe with plain equality (no
#     IS NOT DISTINCT FROM — kept to certified constructs only).
# Equivalence to the old text is pinned by tests/test_roll_oracle.py
# (old-vs-new in DuckDB on standard, NULL-injected, and adversarial
# boundary fixtures).
_ROLL_ORACLE = f"""WITH ev AS (
         SELECT event_id, user_id,
                CASE WHEN user_id IS NULL THEN 'n'
                     ELSE 'v' || CAST(user_id AS VARCHAR) END AS uk,
                epoch_us(ts) AS us,
                CAST(FLOOR(value * 100.0) AS BIGINT) AS dvc
         FROM events),
       tg AS (
         SELECT uk, us,
                CAST(COUNT(*) AS BIGINT) AS c,
                CAST(SUM(COALESCE(dvc, CAST(0 AS BIGINT)))
                     AS BIGINT) AS s,
                CAST(COUNT(dvc) AS BIGINT) AS cs
         FROM ev WHERE us IS NOT NULL GROUP BY uk, us),
       pts AS (
         SELECT uk, us AS t, 0 AS is_probe, c, s, cs FROM tg
         UNION ALL
         SELECT uk, us - {ROLL_US + 1} AS t, 1 AS is_probe,
                CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                CAST(0 AS BIGINT)
         FROM tg),
       cum AS (
         SELECT uk, t, is_probe,
                CAST(SUM(c) OVER w AS BIGINT) AS cum_c,
                CAST(SUM(s) OVER w AS BIGINT) AS cum_s,
                CAST(SUM(cs) OVER w AS BIGINT) AS cum_cs
         FROM pts
         WINDOW w AS (PARTITION BY uk ORDER BY t NULLS LAST, is_probe
                      ROWS UNBOUNDED PRECEDING)),
       roll AS (
         SELECT r.uk, r.t AS us,
                r.cum_c - p.cum_c AS n,
                r.cum_s - p.cum_s AS sm,
                r.cum_cs - p.cum_cs AS ncs
         FROM cum r JOIN cum p
           ON p.uk = r.uk AND p.t = r.t - {ROLL_US + 1}
          AND r.is_probe = 0 AND p.is_probe = 1),
       ng AS (
         SELECT uk, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(dvc) AS BIGINT) AS sm
         FROM ev WHERE us IS NULL GROUP BY uk)
       SELECT e.event_id, e.user_id,
              CAST(CASE WHEN e.us IS NULL THEN ng.n ELSE r.n END
                   AS BIGINT) AS n_1h,
              CAST(CASE WHEN e.us IS NULL THEN ng.sm
                        WHEN r.ncs > 0 THEN r.sm END
                   AS BIGINT) AS sum_1h_cents
       FROM ev e
       LEFT JOIN roll r ON r.uk = e.uk AND r.us = e.us
       LEFT JOIN ng ON ng.uk = e.uk AND e.us IS NULL
       ORDER BY e.event_id"""


@declared("q153_rolling_window", _ROLL_ORACLE)
def q153(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user 1-hour rolling event count + value sum over integer
    epoch-microseconds, exact in BIGINT integer cents (r9: the value
    enters as ``FLOOR(value * 100.0)`` — one IEEE multiply + floor,
    bit-identical across engines; the r8 q170 probe proved the former
    double→DECIMAL(18,2) cast half-rounds differently on the driver's
    DuckDB). Computed by prefix sums over a real+boundary-probe union
    (``operators/rolling.py``) — NOT the naive ``RANGE w PRECEDING``
    sliding frame: Spark evaluates sliding frames in O(n x frame_width)
    per partition (no retraction), which the round-5 scale probe
    measured at x24 per x10 rows on bursty sessions data (18.6 s @
    500k events vs 0.78 s @ 50k). The prefix formulation is O(n log n)
    regardless of frame width and hash-identical (same inclusive
    [ts-1h, ts] frame, peer-inclusive RANGE semantics on both sides).
    Also not the events-x-events self-join trap (quadratic per user).
    Shuffles: one window shuffle on user_id + one join-back on
    event_id."""
    from iceberg_cache_spark.operators.rolling import rolling_time_agg

    e = T(spark, sf, "events")
    ev = e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("dv"),
    )
    r = rolling_time_agg(ev, ROLL_US, cnt_out="n_1h", sum_out="sum_1h_cents")
    return r.select(
        "event_id",
        "user_id",
        F.col("n_1h").cast("bigint").alias("n_1h"),
        F.col("sum_1h_cents").cast("bigint").alias("sum_1h_cents"),
    ).orderBy("event_id")


# bucket width for the chunked rolling plan: 4 frame-widths balances
# halo replication (w/B = 25% extra rows) against per-bucket task size
ROLL_BUCKET_US = 4 * ROLL_US


@declared("q166_rolling_window_chunked", _ROLL_ORACLE)
def q166(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME per-user 1-hour rolling metrics as q153, computed by
    the skew-resilient chunked plan (``rolling_time_agg_chunked``):
    prefix sums per (user, 4-hour bucket) with a one-frame-width halo
    replicated into the next bucket, so the windows' max task holds
    one hot user's BUCKET, not the user's entire history. On uniform
    keys this costs ~25% row replication over q153's plan; under the
    skew gate's regime (one user = 86% of a 100 TB stream) it is the
    difference between a parallel plan and one straggler task sorting
    86 TB. Declared oracle is literally q153's — exactness of the
    decomposition is part of the contract (bit-identical BIGINT-cents
    sums, SQL NULL-peer-group frames for NULL ts)."""
    from iceberg_cache_spark.operators.rolling import rolling_time_agg_chunked

    e = T(spark, sf, "events")
    ev = e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("dv"),
    )
    r = rolling_time_agg_chunked(
        ev, ROLL_US, ROLL_BUCKET_US, cnt_out="n_1h", sum_out="sum_1h_cents"
    )
    return r.select(
        "event_id",
        "user_id",
        F.col("n_1h").cast("bigint").alias("n_1h"),
        F.col("sum_1h_cents").cast("bigint").alias("sum_1h_cents"),
    ).orderBy("event_id")


@declared("q172_rolling_window_auto", _ROLL_ORACLE)
def q172(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME per-user 1-hour rolling metrics as q153/q166, with the
    ENGINE choosing the physical plan (``rolling_time_agg_auto``,
    round-8): a deterministic 1-in-16 hash sample estimates the key
    distribution, and the query runs unchunked on well-distributed
    keys or chunked when one key's share (>=30%) or absolute row count
    (>=2M) would serialize a window task. Closes the r7 gap where the
    skew tier existed as a parallel API a 100 TB user had to know to
    reach for — now the default path degrades gracefully under skew
    without a code change. Output is bit-identical on either branch
    (shared declared oracle; property tests pin both plans), so the
    estimator steers only cost. On the standard fixtures (150+ uniform
    users) it selects the default plan; on the skew gate's 86%-hot-key
    fixture it selects chunked — both asserted in
    tests/test_rolling_auto.py."""
    from iceberg_cache_spark.operators.rolling import rolling_time_agg_auto

    e = T(spark, sf, "events")
    ev = e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("dv"),
    )
    r = rolling_time_agg_auto(
        ev, ROLL_US, ROLL_BUCKET_US, cnt_out="n_1h", sum_out="sum_1h_cents"
    )
    return r.select(
        "event_id",
        "user_id",
        F.col("n_1h").cast("bigint").alias("n_1h"),
        F.col("sum_1h_cents").cast("bigint").alias("sum_1h_cents"),
    ).orderBy("event_id")


@declared(
    "q155_tfidf_top_terms",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
       tc AS (SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       dl AS (SELECT doc_id, COUNT(*) AS len FROM tok GROUP BY 1),
       dfq AS (SELECT term, COUNT(*) AS df FROM tc GROUP BY 1),
       n AS (SELECT COUNT(*) AS n FROM documents),
       scored AS (
         SELECT doc_id, term,
                ROUND((c / CAST(len AS DOUBLE))
                      * ln(n / CAST(df AS DOUBLE)), 6) AS score
         FROM tc JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN n),
       ranked AS (
         SELECT doc_id, term, score,
                CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, term) AS BIGINT) AS rnk
         FROM scored)
       SELECT doc_id, term, score, rnk FROM ranked WHERE rnk <= 3
       ORDER BY doc_id, rnk""",
)
def q155(spark: SparkSession, sf: str) -> DataFrame:
    """TF-IDF top-3 characteristic terms per document — the classic
    keyword-extraction pass of a text pipeline. tf = term count /
    doc length (multiset counts), idf = ln(N / doc-frequency); the
    score is ROUNDED to 6 decimals BEFORE ranking so rank order can't
    depend on sub-ulp ln() differences between engines (ties then break
    on the term string). Plan shape: one exploded-token aggregate
    (hash agg, map-side combine), the per-term df table joined back,
    the 1-row corpus count broadcast, top-k per doc via window rank —
    shuffles on (doc, term) / term / doc, all high-cardinality."""
    d = T(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tc = tok.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("len"))
    dfq = tc.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    scored = (
        tc.join(dl, "doc_id")
        .join(dfq, "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("c") / F.col("len").cast("double"))
                * F.log(F.col("n") / F.col("df").cast("double")),
                6,
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "score", "rnk")
        .orderBy("doc_id", "rnk")
    )


# one oracle text for both session-funnel plans (q156 single-shuffle
# window composition, q168 skew-chunked window-free aggregates).
_FUNNEL_ORACLE = f"""WITH ev AS (
         SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         FROM events),
       gaps AS (
         SELECT user_id, event_id, event_type, us,
                CASE WHEN us IS NULL
                       OR us - LAG(us) OVER w > {SESSION_GAP_US}
                       OR LAG(us) OVER w IS NULL
                     THEN 1 ELSE 0 END AS new_sess
         FROM ev WINDOW w AS (PARTITION BY user_id
                              ORDER BY us NULLS LAST, event_id)),
       sess AS (
         SELECT user_id, event_id, event_type, us,
                CAST(SUM(new_sess) OVER (PARTITION BY user_id
                     ORDER BY us NULLS LAST, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         FROM gaps),
       flag1 AS (
         SELECT user_id, session_id, event_type, us, event_id,
                MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id, session_id
                        ORDER BY us NULLS LAST, event_id
                        ROWS UNBOUNDED PRECEDING) AS seen_view
         FROM sess),
       flag2 AS (
         SELECT user_id, session_id, event_type, us, event_id, seen_view,
                MAX(CASE WHEN event_type = 'click' AND seen_view = 1
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id, session_id
                        ORDER BY us NULLS LAST, event_id
                        ROWS UNBOUNDED PRECEDING) AS click_after_view
         FROM flag1),
       flag3 AS (
         SELECT user_id, session_id, event_type, seen_view, click_after_view,
                MAX(CASE WHEN event_type = 'purchase'
                              AND click_after_view = 1
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id, session_id
                        ORDER BY us NULLS LAST, event_id
                        ROWS UNBOUNDED PRECEDING) AS purchase_after
         FROM flag2)
       SELECT user_id, session_id,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(MAX(seen_view) AS INT) AS reached_view,
              CAST(MAX(click_after_view) AS INT) AS reached_click,
              CAST(MAX(purchase_after) AS INT) AS reached_purchase
       FROM flag3 GROUP BY user_id, session_id
       ORDER BY user_id, session_id"""


@declared("q156_session_funnel", _FUNNEL_ORACLE)
def q156(spark: SparkSession, sf: str) -> DataFrame:
    """Session-scoped ORDERED funnel: within each 30-min-gap session,
    did the user view -> (then) click -> (then) purchase, in event
    order? Running-max window flags make each stage conditional on the
    previous stage having already happened EARLIER IN THE SAME SESSION
    — the semantics product funnels actually need, and the composition
    of q152 (sessions) with q130 (funnel) neither covers alone.

    Plan shape: session ids ride the user_id windows, and Catalyst
    recognizes that hashpartitioning(user_id) already clusters the
    (user_id, session_id) stage-flag windows and the final aggregate —
    the whole query is ONE hash shuffle regardless of corpus size
    (plan-guarded), never an event-to-event self-join.

    NULL event times are their own sessions (same contract and explicit
    NULLS LAST ordering as q152).

    The plan body lives in
    ``operators/sessionize.py::session_funnel_default`` (extracted r8
    so ``session_funnel_auto`` delegates to the identical
    expressions)."""
    from iceberg_cache_spark.operators.sessionize import session_funnel_default

    e = T(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = e.select("user_id", "event_id", "event_type", us.alias("us"))
    out = session_funnel_default(ev, SESSION_GAP_US)
    return out.select(
        "user_id",
        "session_id",
        "n_events",
        "reached_view",
        "reached_click",
        "reached_purchase",
    ).orderBy("user_id", "session_id")


# bucket width for the chunked sessionization plan: 8 gap-widths (4 h)
# bounds every local-phase task; ANY positive bucket is exact here
SESS_BUCKET_US = 8 * SESSION_GAP_US


@declared("q167_sessionization_chunked", _SESS_ORACLE)
def q167(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME gap sessionization as q152, computed by the
    skew-resilient two-phase plan (``operators/sessionize.py``):
    per-(user, 4h-bucket) local sessions aggregated immediately, then a
    per-user merge over BUCKET SUMMARIES (one row per non-empty bucket)
    that stitches boundary-spanning sessions and renumbers globally —
    an exclusive prefix sum of ``local_sessions - merged``. Max task
    drops from one hot user's entire history to one bucket of it; the
    chain semantics (each event's session depends on its predecessor)
    survive exactly because only the boundary PAIR matters across
    buckets. Declared oracle is literally q152's — numbering and
    aggregates are bit-identical, including NULL-time events as their
    own trailing sessions."""
    from iceberg_cache_spark.operators.sessionize import sessionize_chunked

    e = T(spark, sf, "events")
    ev = e.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    s = sessionize_chunked(ev, SESSION_GAP_US, SESS_BUCKET_US)
    return s.select(
        "user_id",
        "session_id",
        "n_events",
        "start_us",
        "end_us",
        (F.col("end_us") - F.col("start_us")).alias("duration_us"),
    ).orderBy("user_id", "session_id")


@declared("q168_session_funnel_chunked", _FUNNEL_ORACLE)
def q168(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME session-scoped ordered funnel as q156, computed
    skew-resiliently (``operators/sessionize.py::session_funnel_chunked``):
    q156-style running stage flags WITHIN each (user, 4h-bucket,
    local-session) segment — every window task bounded by one bucket of
    one user — then the funnel state composes across buckets as a
    monoid over SEGMENT SUMMARY rows (one per spanned bucket): a
    cross-segment pair exists iff a later segment supplies the next
    stage after an earlier prefix supplied the previous one, an
    exhaustive case split (vc* = vc ∨ v_before∧c; vcp* = vcp ∨
    vc*_before∧p ∨ v_before∧cp). One heavy shuffle total; no
    per-session join ever touches the raw event stream. q156's plan,
    by contrast, stacks four windows partitioned by the raw user key —
    one hot user serializes its entire history through one task.
    Declared oracle is literally q156's; flags and numbering are
    bit-identical, including NULL-time single-event sessions."""
    from iceberg_cache_spark.operators.sessionize import session_funnel_chunked

    e = T(spark, sf, "events")
    ev = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    out = session_funnel_chunked(ev, SESSION_GAP_US, SESS_BUCKET_US)
    return out.select(
        "user_id",
        "session_id",
        "n_events",
        "reached_view",
        "reached_click",
        "reached_purchase",
    ).orderBy("user_id", "session_id")


# hourly gap-fill bucket width (== the rolling frame width)
GAPFILL_H_US = ROLL_US

_GAPFILL_ORACLE = f"""WITH ev AS (
         SELECT CASE WHEN user_id IS NULL THEN 'n'
                     ELSE 'v' || CAST(user_id AS VARCHAR) END AS uk,
                user_id, event_id, epoch_us(ts) AS us,
                CAST(FLOOR(value * 100.0) AS BIGINT) AS dvc
         FROM events WHERE ts IS NOT NULL),
       evb AS (
         SELECT *, CAST((us - ((us % {GAPFILL_H_US} + {GAPFILL_H_US})
                               % {GAPFILL_H_US})) // {GAPFILL_H_US}
                        AS BIGINT) AS b
         FROM ev),
       obs AS (
         SELECT uk, b, CAST(COUNT(*) AS BIGINT) AS n_obs
         FROM evb GROUP BY uk, b),
       lastv AS (
         SELECT uk, b, dvc AS v_last FROM (
           SELECT uk, b, dvc,
                  ROW_NUMBER() OVER (PARTITION BY uk, b
                       ORDER BY us DESC, event_id DESC) AS rn
           FROM evb WHERE dvc IS NOT NULL) WHERE rn = 1),
       ub AS (
         SELECT uk, MIN(user_id) AS user_id,
                MIN(b) AS b0, MAX(b) AS b1
         FROM evb GROUP BY uk),
       series AS (
         SELECT uk, user_id,
                CAST(UNNEST(generate_series(b0, b1)) AS BIGINT) AS b
         FROM ub),
       j AS (
         SELECT s.uk, s.user_id, s.b, o.n_obs, l.v_last
         FROM series s
         LEFT JOIN obs o ON o.uk = s.uk AND o.b = s.b
         LEFT JOIN lastv l ON l.uk = s.uk AND l.b = s.b),
       g AS (
         SELECT uk, user_id, b, n_obs, v_last,
                CAST(COUNT(v_last) OVER (PARTITION BY uk ORDER BY b
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp
         FROM j)
       SELECT user_id, b AS bucket_h,
              CAST(COALESCE(n_obs, 0) AS BIGINT) AS n_obs,
              CAST(MAX(v_last) OVER (PARTITION BY uk, grp ORDER BY b
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v_cents_locf
       FROM g ORDER BY user_id, bucket_h"""


# Max elements in any single generated bucket array (gap-fill dense
# grid). 65536 hourly buckets ≈ 7.5 years per slab — any real series
# fits in a handful of slabs.
GAPFILL_SLAB = 65536


def _explode_span(g: DataFrame) -> DataFrame:
    """Explode each row's bucket span ``[b, e_b]`` into one row per
    bucket (column ``bb``), slab-chunked (round 10 guard — VERDICT r9
    "What's wrong" #2).

    A bare ``F.explode(F.sequence(b, e_b))`` materializes a row's
    WHOLE span as one array. Bounded by time span that is fine for
    any realistic series (10 years hourly ≈ 88k elements ≈ sub-MB),
    but one corrupt/outlier timestamp pair (an event in 1970 plus one
    in 2026) would build a ~500k-element array on a single row before
    the explode. Two-level explode instead: slab index first (a
    ``(e_b-b) DIV 65536 + 1``-element sequence — 8 rows for the
    1970/2026 case), then the ≤65536-element slab sequence. Identical
    rows and hashes; worst-case array size is bounded by the slab
    constant instead of the data. Same plan-guard philosophy as
    ``operators/rolling.py``'s frame guard.
    """
    slabs = g.withColumn(
        "s",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.expr(f"(e_b - b) DIV {GAPFILL_SLAB}"),
            )
        ),
    )
    return slabs.withColumn(
        "bb",
        F.explode(
            F.sequence(
                F.col("b") + F.col("s") * F.lit(GAPFILL_SLAB),
                F.least(
                    F.col("e_b"),
                    F.col("b") + (F.col("s") + 1) * F.lit(GAPFILL_SLAB) - 1,
                ),
            )
        ),
    )


@declared("q175_gapfill_locf", _GAPFILL_ORACLE)
def q175(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series densification (round 9): per-user HOURLY buckets
    from the user's first to last event with gaps filled and the value
    carried forward — the `time_bucket_gapfill` + LOCF operator every
    hypertable/monitoring pipeline ships, and the missing step between
    raw events and fixed-grid models (forecasting windows, per-hour
    joins). Emits (user_id, bucket_h, n_obs, v_cents_locf): n_obs = 0
    on gap rows; the carried value is the bucket's LAST non-NULL-value
    observation (by event time, event_id tiebreak) in BIGINT integer
    cents (the r9 portable derivation — no engine rounding rule on the
    hash path).

    The DECLARED oracle computes LOCF with the portable two-window
    grouping trick — cumulative COUNT(v) assigns each gap row to its
    predecessor observation's group, running MAX inside (key, group)
    carries the single non-NULL value — instead of `last_value(...
    IGNORE NULLS)`, which not every engine build supports (same
    certified-construct discipline as the rolling oracle). The SPARK
    side uses its native `last(v, ignorenulls=True)` cumulative window
    — identical semantics, and ONE window pass instead of the trick's
    two (the (key, group) partition would cost an extra exchange +
    sort; the first bench read measured the difference). NULL
    semantics: NULL-ts events are excluded (no bucket is defined for
    them — documented, tested); a NULL user_id is one ordinary series
    via the `uk` surrogate key, so every join stays a plain non-null
    equi-join.

    Plan shape at 100 TB (round 14): ONE hash-agg per (user, bucket)
    computes both the bucket's event count and its last observation —
    the last-obs pick is a struct-MAX over (us, event_id, value), a
    map-side-combining aggregate instead of a row_number window — so
    the raw stream is read once and shuffled once. One window pass
    over the OBSERVED buckets (cumulative LOCF value + lead(bucket))
    assigns each observation the run of grid buckets it owns, and the
    slab-chunked explode emits the dense grid directly — no bounds
    aggregate, no grid join, no second pass of any kind. The explode
    is bounded by the key's TIME SPAN (not its row count — a hot user
    densifies to the same ~N-hour grid as a cold one, so the gapfill
    itself is skew-immune); the presentation sort is the only global
    exchange. (The first bench read of the naive two-join + window
    formulation measured 4.0 s at sf0.1 — 5th-costliest in the suite.)"""
    return gapfill_locf(T(spark, sf, "events"))


def _gapfill_obs(e: DataFrame) -> DataFrame:
    """Shared gap-fill prelude: ONE hash-agg per (user, bucket) with
    count + struct-max last-obs pick (lexicographic on (us, event_id)
    over non-NULL values — identical to the declared ROW_NUMBER ...
    DESC pick, but partially aggregable map-side)."""
    uk = F.when(F.col("user_id").isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v"), F.col("user_id").cast("string"))
    )
    ev = e.select(
        uk.alias("uk"),
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("dvc"),
    ).filter(F.col("us").isNotNull())
    evb = ev.withColumn(
        "b",
        F.expr(
            f"CAST((us - pmod(us, {GAPFILL_H_US})) DIV {GAPFILL_H_US} "
            "AS BIGINT)"
        ),
    )
    return evb.groupBy("uk", "b").agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.min("user_id").alias("user_id"),
        F.max(
            F.when(
                F.col("dvc").isNotNull(),
                F.struct("us", "event_id", "dvc"),
            )
        )["dvc"].alias("v_last"),
    )


def gapfill_locf(e: DataFrame) -> DataFrame:
    """LOCF densification over an events-shaped DataFrame (q175 body;
    importable so the adversarial-span pytest can drive it on a
    synthetic corrupt-timestamp fixture)."""
    # Round 14: gap rows are generated from CONSECUTIVE-observation
    # spans instead of a dense-grid join. Per observed bucket, lead(b)
    # bounds the half-open run of grid buckets this observation owns
    # ([b, next_b) — the last observation owns just itself), and the
    # LOCF value for every bucket in the run IS the run owner's
    # carried value (there is no observation in between to change it),
    # so the cumulative last(ignorenulls) window runs over OBSERVED
    # buckets only and the exploded gap rows inherit its result. This
    # deletes round 13's contested materialize barrier (driver: q175
    # 2.2 → 3.7 s) *and* the round-12 double aggregate it papered
    # over: one (uk, b) agg exchange (map-side combining), ONE window
    # pass over observed rows — not the dense grid — no bounds
    # aggregate, no grid join, no checkpoint. Output identical: the
    # union of the runs is exactly [min(b), max(b)] per key
    # (oracle-matched sf0.001/0.01/0.1; guide §1.2 "the distributed
    # algorithm", §2.4). Skew story unchanged: a key's exploded run
    # total is bounded by its time span, not its row count.
    obs = _gapfill_obs(e)
    w_ord = W.partitionBy("uk").orderBy("b")
    w_cum = w_ord.rowsBetween(W.unboundedPreceding, 0)
    g = obs.select(
        "user_id",
        "b",
        "n_obs",
        F.last("v_last", ignorenulls=True).over(w_cum).alias("v_locf"),
        F.coalesce(F.lead("b").over(w_ord) - 1, F.col("b")).alias("e_b"),
    )
    rows = _explode_span(g)
    return rows.select(
        "user_id",
        F.col("bb").cast("bigint").alias("bucket_h"),
        F.when(F.col("bb") == F.col("b"), F.col("n_obs"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_obs"),
        F.col("v_locf").cast("bigint").alias("v_cents_locf"),
    ).orderBy("user_id", "bucket_h")


_LERP_ORACLE = f"""WITH ev AS (
         SELECT CASE WHEN user_id IS NULL THEN 'n'
                     ELSE 'v' || CAST(user_id AS VARCHAR) END AS uk,
                user_id, event_id, epoch_us(ts) AS us,
                CAST(FLOOR(value * 100.0) AS BIGINT) AS dvc
         FROM events WHERE ts IS NOT NULL),
       evb AS (
         SELECT *, CAST((us - ((us % {GAPFILL_H_US} + {GAPFILL_H_US})
                               % {GAPFILL_H_US})) // {GAPFILL_H_US}
                        AS BIGINT) AS b
         FROM ev),
       obs AS (
         SELECT uk, b, MIN(user_id) AS user_id,
                CAST(COUNT(*) AS BIGINT) AS n_obs
         FROM evb GROUP BY uk, b),
       lastv AS (
         SELECT uk, b, dvc AS v_last FROM (
           SELECT uk, b, dvc,
                  ROW_NUMBER() OVER (PARTITION BY uk, b
                       ORDER BY us DESC, event_id DESC) AS rn
           FROM evb WHERE dvc IS NOT NULL) WHERE rn = 1),
       ub AS (
         SELECT uk, MIN(user_id) AS user_id,
                MIN(b) AS b0, MAX(b) AS b1
         FROM evb GROUP BY uk),
       series AS (
         SELECT uk, user_id,
                CAST(UNNEST(generate_series(b0, b1)) AS BIGINT) AS b
         FROM ub),
       j AS (
         SELECT s.uk, s.user_id, s.b, o.n_obs, l.v_last
         FROM series s
         LEFT JOIN obs o ON o.uk = s.uk AND o.b = s.b
         LEFT JOIN lastv l ON l.uk = s.uk AND l.b = s.b),
       g AS (
         SELECT uk, user_id, b, n_obs, v_last,
                CAST(COUNT(v_last) OVER (PARTITION BY uk ORDER BY b
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp,
                CAST(COUNT(v_last) OVER (PARTITION BY uk ORDER BY b DESC
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rgrp
         FROM j),
       ends AS (
         SELECT uk, user_id, b, n_obs,
                MAX(v_last) OVER wf AS v_prev,
                MAX(CASE WHEN v_last IS NOT NULL THEN b END) OVER wf AS b_prev,
                MAX(v_last) OVER wb AS v_next,
                MIN(CASE WHEN v_last IS NOT NULL THEN b END) OVER wb AS b_next
         FROM g
         WINDOW wf AS (PARTITION BY uk, grp ORDER BY b
                       ROWS UNBOUNDED PRECEDING),
                wb AS (PARTITION BY uk, rgrp ORDER BY b DESC
                       ROWS UNBOUNDED PRECEDING))
       SELECT user_id, b AS bucket_h,
              CAST(COALESCE(n_obs, 0) AS BIGINT) AS n_obs,
              CAST(CASE
                WHEN b_prev IS NULL OR b_next IS NULL THEN NULL
                WHEN b_next = b_prev THEN v_prev
                ELSE v_prev +
                  ((v_next - v_prev) * (b - b_prev)
                   - (((v_next - v_prev) * (b - b_prev)) % (b_next - b_prev)
                      + (b_next - b_prev)) % (b_next - b_prev))
                  // (b_next - b_prev)
              END AS BIGINT) AS v_cents_lerp
       FROM ends ORDER BY user_id, bucket_h"""


@declared("q176_gapfill_interpolate", _LERP_ORACLE)
def q176(spark: SparkSession, sf: str) -> DataFrame:
    """Linear-interpolation densification (round 9) — q175's sibling
    and the other half of the hypertable gap-fill pair (`locf` /
    `interpolate`): per-user hourly buckets with gap rows filled by the
    straight line between the surrounding observations, exact in BIGINT
    cents via the portable floor-division idiom
    ``a - pmod(a, d)) / d`` (Spark's DIV truncates toward zero while
    some engines' ``//`` floors — the pmod form floors identically on
    both for the positive bucket-distance denominator, so negative
    slopes can't diverge). Buckets before the first or after the last
    observation are NULL (the SQL-standard interpolate contract —
    LOCF tails are q175's job); an observed bucket interpolates to its
    own last observation.

    The DECLARED oracle finds the neighbors with q175's certified
    grouping trick, mirrored forward/backward (cumulative COUNT groups
    + running MAX carrying value AND bucket). The SPARK side uses
    native `last(ignorenulls)` cumulative windows — identical
    semantics, one window pass per direction instead of the trick's
    two (each (key, group) partition would add an exchange + sort; the
    first bench read measured the 4-window form at 5.4 s) — all
    partitioned by user and, since round 14, over OBSERVED buckets
    only: gap rows are generated from consecutive-observation spans
    (see gapfill_interpolate), so there is no dense-grid join at all.
    Same skew story as q175: the grid is bounded by a key's time span,
    not its row count."""
    return gapfill_interpolate(T(spark, sf, "events"))


def gapfill_interpolate(e: DataFrame) -> DataFrame:
    """Linear-interpolation densification over an events-shaped
    DataFrame (q176 body; importable for the adversarial-span test)."""
    # Round 14: same consecutive-observation-span generation as
    # gapfill_locf — the interpolation endpoints are constant inside a
    # run of gap buckets ([b, next_b)): the previous observation with
    # a value is the run owner's (no observation sits in between) and
    # the next one is the value-carrying neighbor AT OR AFTER next_b,
    # i.e. lead() of the descending cumulative's result. So all four
    # endpoint columns are window passes over OBSERVED buckets, and
    # round 13's "two sorts of the ~1M dense grid" (the tier's
    # documented residual) become two sorts of the observed rows. No
    # bounds aggregate, no grid join, no materialize barrier
    # (driver-regressed in r13: 3.8 → 4.5 s). Oracle-matched
    # sf0.001/0.01/0.1.
    #
    # The declared oracle uses the portable grouping trick; the Spark
    # side uses native last(ignorenulls) — identical semantics, ONE
    # window pass per direction instead of two (the (key, group)
    # partitions cost an extra exchange + sort each; the first bench
    # read measured the 4-window formulation at 5.4 s). The backward
    # direction keeps the DESCENDING cumulative frame on purpose
    # (round 13): first(ignorenulls) over [currentRow,
    # unboundedFollowing] is semantically identical and would share
    # the ascending sort, but Spark's UnboundedFollowing window frame
    # re-evaluates the aggregate from scratch per row — O(rows²) per
    # partition, measured 58 s vs 6 s at sf0.1 — so the second sort is
    # the right price.
    obs = _gapfill_obs(e)
    w_asc = W.partitionBy("uk").orderBy("b")
    w_cum = w_asc.rowsBetween(W.unboundedPreceding, 0)
    w_desc = (
        W.partitionBy("uk")
        .orderBy(F.col("b").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    obs_b = F.when(F.col("v_last").isNotNull(), F.col("b"))
    g1 = obs.withColumn(
        "v_next", F.last("v_last", ignorenulls=True).over(w_desc)
    ).withColumn("b_next", F.last(obs_b, ignorenulls=True).over(w_desc))
    g2 = g1.select(
        "user_id",
        "b",
        "n_obs",
        "v_next",
        "b_next",
        F.last("v_last", ignorenulls=True).over(w_cum).alias("v_prev"),
        F.last(obs_b, ignorenulls=True).over(w_cum).alias("b_prev"),
        F.coalesce(F.lead("b").over(w_asc) - 1, F.col("b")).alias("e_b"),
        F.lead("v_next").over(w_asc).alias("nxt_v"),
        F.lead("b_next").over(w_asc).alias("nxt_b"),
    )
    rows = _explode_span(g2)
    is_obs = F.col("bb") == F.col("b")
    ends = rows.select(
        "user_id",
        F.col("bb").alias("bh"),
        F.when(is_obs, F.col("n_obs")).otherwise(F.lit(0)).alias("n_obs_e"),
        "v_prev",
        "b_prev",
        F.when(is_obs, F.col("v_next")).otherwise(F.col("nxt_v")).alias("v_nxt"),
        F.when(is_obs, F.col("b_next")).otherwise(F.col("nxt_b")).alias("b_nxt"),
    )
    lerp = F.expr(
        "CASE WHEN b_prev IS NULL OR b_nxt IS NULL THEN NULL "
        "WHEN b_nxt = b_prev THEN v_prev "
        "ELSE v_prev + "
        "  ((v_nxt - v_prev) * (bh - b_prev) "
        "   - pmod((v_nxt - v_prev) * (bh - b_prev), b_nxt - b_prev)) "
        "  DIV (b_nxt - b_prev) END"
    )
    return ends.select(
        "user_id",
        F.col("bh").cast("bigint").alias("bucket_h"),
        F.col("n_obs_e").cast("bigint").alias("n_obs"),
        lerp.cast("bigint").alias("v_cents_lerp"),
    ).orderBy("user_id", "bucket_h")
