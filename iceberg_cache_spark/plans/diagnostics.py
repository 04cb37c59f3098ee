"""One-construct diagnostic probes (round 8).

q153/q166 have been the corpus's only driver-red rows for three
rounds: rows and schema match, the value hash doesn't, and every
locally constructible adversarial fixture hash-matches (VERDICT r7).
Their oracle's composite shape made the residual divergence
un-localizable from a red row alone, so round 8 splits the suspect
constructs into three MINIMAL declared queries, ordered directly
after q153/q166 in the registry:

- q169: the `RANGE <offset> PRECEDING` window frame alone — q153's
  exact frame constant over the same events epoch-µs key, COUNT only,
  no decimals, no joins. Never driver-green in any composite; if THIS
  row is red, the driver oracle's RANGE-offset frame implementation is
  formally indicted and expressing oracles in prefix-sum form (the r8
  `_ROLL_ORACLE` rewrite) becomes permanent policy.
- q170: the value-derivation construct alone. In round 8 it ran the
  red pair's `CAST(value AS DECIMAL(18,2))` and came back RED — the
  answer the probe tier existed to produce (the cast, not the frame,
  was the three-round divergence). In round 9 it carries the portable
  `FLOOR(value * 100.0)` integer-cents replacement to certify the fix.
- q171: `epoch_us(ts)` identity projection alone — the only time
  arithmetic in the red pair's input prep (already green inside
  q152/q167/q168 composites; this isolates it).

All three are trivially cheap at every scale factor (the standard
events fixtures average ~1.1 rows per 1-hour frame) and each carries a
total ORDER BY over the unique event_id per the determinism contract.

These are diagnostics, not operator coverage: the operator families
they touch are already in SURVEY §2.2 (q32/q35 frames, q05 casts,
q59 timestamp arithmetic). They exist to make a residual red row
self-localizing instead of burning a fourth round of guesswork.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from iceberg_cache_spark.plans.registry import declared
from iceberg_cache_spark.plans.sessions import ROLL_US
from iceberg_cache_spark.sources.testdata import load_table as T


@declared(
    "q169_range_frame_probe",
    f"""WITH ev AS (
         SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
       SELECT event_id,
              CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN {ROLL_US} PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_frame
       FROM ev ORDER BY event_id""",
)
def q169(spark: SparkSession, sf: str) -> DataFrame:
    """The RANGE-offset frame construct in isolation: q153's exact
    1-hour integer-µs frame, COUNT(*) only. Both sides evaluate the
    construct natively (Spark ``rangeBetween``, DuckDB ``RANGE BETWEEN
    n PRECEDING``) — deliberately NOT the prefix rewrite, because the
    probe's job is to measure whether the two engines' native RANGE
    frames agree on this fixture. Cheap by construction here (~1.1
    rows/frame on the standard fixtures); the O(n×width) concern only
    applies to bursty corpora (operators/rolling.py docstring)."""
    e = T(spark, sf, "events")
    ev = e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("us").asc())
        .rangeBetween(-ROLL_US, 0)
    )
    return (
        ev.select(
            "event_id",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_frame"),
        )
        .orderBy("event_id")
    )


@declared(
    "q170_decimal_cast_probe",
    """SELECT event_id, CAST(FLOOR(value * 100.0) AS BIGINT) AS dv_cents
       FROM events ORDER BY event_id""",
)
def q170(spark: SparkSession, sf: str) -> DataFrame:
    """The value-derivation construct in isolation. Round 8 this probe
    ran the red pair's original `CAST(value AS DECIMAL(18,2))` as a
    bare identity projection and came back driver-RED while q169/q171
    were green (CORRECTNESS_r08.json) — formally indicting the
    double→DECIMAL half-rounding rule, which differs between Spark and
    the driver's DuckDB build (local DuckDB 1.0.0 agrees with Spark).
    Round 9 the probe carries the REPLACEMENT derivation the whole
    rolling tier now uses — `FLOOR(value * 100.0)` integer cents: one
    IEEE-754 double multiply (a single operation, bit-identical on any
    IEEE engine, immune even to FMA contraction) and an exact floor,
    cast to BIGINT. A green row here certifies the construct the
    q153/q166/q172 fix rests on."""
    e = T(spark, sf, "events")
    return e.select(
        "event_id",
        F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("dv_cents"),
    ).orderBy("event_id")


@declared(
    "q171_epoch_us_probe",
    """SELECT event_id, epoch_us(ts) AS us FROM events ORDER BY event_id""",
)
def q171(spark: SparkSession, sf: str) -> DataFrame:
    """timestamp → integer epoch-µs in isolation — the red pair's only
    time arithmetic, as a bare identity projection."""
    e = T(spark, sf, "events")
    return e.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).orderBy("event_id")
