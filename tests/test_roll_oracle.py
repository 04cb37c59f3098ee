"""Pin the prefix-sum `_ROLL_ORACLE` to the declared RANGE-frame
semantics.

History: q153/q166 were the only driver-red rows for three rounds
while hash-matching locally. Round 7's hypothesis blamed the `RANGE
<offset> PRECEDING` frame and round 8 rewrote the oracle as a
prefix-sum decomposition — but the r8 one-construct probes then
exonerated the frame (q169 GREEN) and indicted the
double→DECIMAL(18,2) value cast instead (q170 RED): the driver's
DuckDB half-rounds that cast differently from Spark. Round 9 replaced
the cast with BIGINT integer cents (`FLOOR(value * 100.0)` — IEEE
bit-identical on both engines). The prefix rewrite stays (it is
better-tested and avoids an O(n×width) frame on the Spark side);
these tests keep pinning that it computes EXACTLY what the direct
RANGE-frame text declares, in DuckDB, on:

- the standard sf0.001 / sf0.01 fixtures,
- the NULL-injected variants (NULL ts / user_id / value),
- an adversarial boundary fixture: exact ties, events exactly
  width and width+1 µs apart, pre-epoch timestamps, negative values,
  a user whose values are ALL NULL (all-NULL frame sums), and NULL
  ts/user combinations.

If these pass while the driver row stays red, the driver's DuckDB
build computes RANGE-offset frames differently from both DuckDB 1.0.0
and the SQL standard — which the q169 one-construct probe then
localizes.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_cache_spark.plans.sessions import ROLL_US, _ROLL_ORACLE

# the declared semantics in direct RANGE-frame form, verbatim.
# r9: the value derivation is BIGINT integer cents (FLOOR(value*100.0)
# — one IEEE multiply + exact floor) instead of the r5–r8
# CAST(value AS DECIMAL(18,2)), whose half-rounding the r8 q170 probe
# proved diverges between Spark and the driver's DuckDB build. The
# frame itself is unchanged; this test keeps pinning that the
# prefix-sum _ROLL_ORACLE computes exactly this frame.
_OLD_ORACLE = f"""WITH ev AS (
         SELECT event_id, user_id, epoch_us(ts) AS us,
                CAST(FLOOR(value * 100.0) AS BIGINT) AS dvc
         FROM events)
       SELECT event_id, user_id,
              CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
              CAST(SUM(dvc) OVER w AS BIGINT) AS sum_1h_cents
       FROM ev
       WINDOW w AS (PARTITION BY user_id ORDER BY us
                    RANGE BETWEEN {ROLL_US} PRECEDING AND CURRENT ROW)
       ORDER BY event_id"""


def _assert_same(events_path: str) -> None:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{events_path}')"
    )
    try:
        old = con.execute(_OLD_ORACLE).df()
        new = con.execute(_ROLL_ORACLE).df()
    finally:
        con.close()
    assert old.shape == new.shape
    assert list(old.columns) == list(new.columns)
    for c in old.columns:
        a, b = old[c], new[c]
        eq = (a.isna() & b.isna()) | (a == b)
        bad = (~eq).to_numpy().nonzero()[0]
        assert len(bad) == 0, (
            f"col {c}: {len(bad)} mismatches, first at row {bad[0]}: "
            f"old={old.iloc[bad[0]].to_dict()} new={new.iloc[bad[0]].to_dict()}"
        )


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_new_oracle_matches_declared_semantics_standard(sf):
    _assert_same(f"/root/testdata/{sf}/events.parquet")


def test_new_oracle_matches_declared_semantics_nulls():
    from tools.gen_nulldata import ensure_nulldata

    d = ensure_nulldata(
        src="/root/testdata/sf0.001",
        dst=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".nulldata",
            "sf0.001",
        ),
        sf="sf0.001",
    )
    _assert_same(os.path.join(d, "events.parquet"))


def test_new_oracle_matches_declared_semantics_adversarial(tmp_path):
    rng = np.random.default_rng(42)
    n = 4000
    w = ROLL_US
    base = rng.integers(-2 * w, 4 * w, n)
    # exact boundary quadruples: anchor, +w (inside), +w+1 (outside), tie
    for i in range(0, 400, 4):
        base[i + 1] = base[i] + w
        base[i + 2] = base[i] + w + 1
        base[i + 3] = base[i]
    us = base.astype("int64")
    ts_null = rng.random(n) < 0.07
    user = rng.integers(0, 12, n).astype("int64")
    user_null = rng.random(n) < 0.08
    val = np.round(rng.normal(0, 100, n), 2)
    val_null = rng.random(n) < 0.15
    val_null |= user == 7  # one user: every frame sum is over NULLs only
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                [None if m else int(u) for m, u in zip(ts_null, us)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array(
                [None if m else int(u) for m, u in zip(user_null, user)],
                pa.int64(),
            ),
            "event_type": pa.array(
                rng.choice(["view", "click", "purchase"], n)
            ),
            "value": pa.array(
                [None if m else float(v) for m, v in zip(val_null, val)],
                pa.float64(),
            ),
            "props": pa.array(["{}"] * n),
        }
    )
    p = str(tmp_path / "events.parquet")
    pq.write_table(tbl, p)
    _assert_same(p)


def test_cents_derivation_engine_portable(tmp_path):
    """The r9 fix's load-bearing claim: `CAST(FLOOR(value * 100.0) AS
    BIGINT)` is bit-identical between Spark and DuckDB on ANY double —
    one IEEE-754 multiply (a single operation, immune to FMA
    contraction) plus an exact floor. Exercise the adversarial ranges
    where the old DECIMAL cast's half-rounding diverged: exact .xx5
    representations, values just under/over cent boundaries, negatives,
    tiny and large magnitudes, and random doubles."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            np.round(rng.normal(0, 100, 2000), 2),
            rng.uniform(-1000, 1000, 2000),
            # exact .xx5 half-cent boundaries, both signs
            (np.arange(-500, 500) + 0.5) / 100.0,
            # one-ulp straddles of an exact cent boundary
            np.nextafter(np.arange(-50, 50) / 100.0 * 100, np.inf) / 100.0,
            np.nextafter(np.arange(-50, 50) / 100.0 * 100, -np.inf) / 100.0,
            rng.uniform(-1e12, 1e12, 500),
            rng.uniform(-1e-6, 1e-6, 500),
        ]
    )
    n = len(vals)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    p = str(tmp_path / "vals.parquet")
    pq.write_table(tbl, p)

    con = duckdb.connect()
    duck = dict(
        con.execute(
            "SELECT event_id, CAST(FLOOR(value * 100.0) AS BIGINT) "
            f"FROM read_parquet('{p}')"
        ).fetchall()
    )
    con.close()

    spark = SparkSession.builder.master("local[2]").getOrCreate()
    got = {
        r.event_id: r.c
        for r in spark.read.parquet(p)
        .select(
            "event_id",
            F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("c"),
        )
        .collect()
    }
    assert got == duck


def test_new_oracle_avoids_range_offset_frames():
    """The whole point of the rewrite: no RANGE <offset> PRECEDING
    construct may appear in the oracle text (ROWS UNBOUNDED PRECEDING
    is the certified cumulative form)."""
    up = _ROLL_ORACLE.upper()
    assert "RANGE BETWEEN" not in up
    assert "ROWS UNBOUNDED PRECEDING" in up
    # r9: the q170-indicted double->DECIMAL cast may not reappear on
    # the hash path either — the pipeline is BIGINT cents end to end
    assert "DECIMAL" not in up
