"""Round-11 regression pins.

1. The q179 driver red (CORRECTNESS_r10.json): the oracle's uncast
   ``SUM() OVER ()`` is HUGEINT in DuckDB — fetchall() narrows it to a
   Python int (every local gate green) but an Arrow/pandas comparator
   renders decimal128(38,0) → float64 (123 vs 123.0 → hash mismatch).
   Pins: the classifier calls the pairing RED, compare() now raises on
   it, and q179's oracle emits pure int64 through Arrow.

2. Tokenizer count parity (VERDICT r10 next-round #1): Spark's Java
   regex tokens() vs the DuckDB RE2 ``_DUCK_TOKS`` fragment must agree
   token-for-token on adversarial text — one divergent count shifts
   every q179 start_off downstream. Pinned over unicode case edges,
   exotic whitespace, and regex corner cases.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.oracle import (
    arrow_type_key,
    assert_type_parity,
    classify_type_pair,
    compare,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# 1. Arrow-type parity
# ---------------------------------------------------------------------------


def test_hugeint_vs_int_is_red():
    assert classify_type_pair(("int",), ("hugeint",)) == "RED"
    assert classify_type_pair(("hugeint",), ("int",)) == "RED"
    assert classify_type_pair(("int",), ("float",)) == "RED"
    assert classify_type_pair(("decimal", 2), ("decimal", 3)) == "RED"
    assert classify_type_pair(("decimal", 2), ("decimal", 2)) is None
    assert classify_type_pair(("int",), ("int",)) is None
    assert classify_type_pair(("list", ("int",)), ("list", ("hugeint",))) == "RED"


def test_duckdb_uncast_window_sum_is_hugeint():
    con = duckdb.connect()
    try:
        tbl = con.execute(
            "SELECT SUM(x) OVER (ORDER BY x) AS s FROM (VALUES (1),(2)) t(x)"
        ).fetch_arrow_table()
    finally:
        con.close()
    assert arrow_type_key(tbl.schema.field("s").type) == ("hugeint",)


def test_compare_raises_on_uncast_hugeint_oracle(spark, tmp_path):
    """End-to-end: identical VALUES, divergent Arrow types → compare()
    must now fail loudly instead of staying silently green like r10."""
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["a", "b"]}),
        str(tmp_path / "documents.parquet"),
    )
    sdf = spark.createDataFrame([(1, 1), (2, 3)], "doc_id: bigint, s: bigint")
    bad_oracle = (
        "SELECT doc_id, SUM(doc_id) OVER (ORDER BY doc_id) AS s "
        "FROM documents ORDER BY doc_id"
    )
    with pytest.raises(AssertionError, match="type-parity RED"):
        compare(sdf, bad_oracle, str(tmp_path))
    good_oracle = (
        "SELECT doc_id, CAST(SUM(doc_id) OVER (ORDER BY doc_id) AS BIGINT) "
        "AS s FROM documents ORDER BY doc_id"
    )
    compare(sdf, good_oracle, str(tmp_path))  # fetchall values identical


def test_q179_oracle_arrow_schema_pure_int64(sf_dir):
    """The actual fix: every q179 oracle column exports as int64."""
    import __spark_entry__ as entry

    from tests.oracle import duck_connection

    sql = entry.oracle_sql()["q179_sequence_packing"]
    con = duck_connection(sf_dir)
    try:
        schema = con.execute(sql).fetch_arrow_table().schema
    finally:
        con.close()
    for field in schema:
        assert pa.types.is_integer(field.type), (
            f"q179 oracle column {field.name} exports as {field.type}; "
            "the driver's Arrow comparator renders non-int64 as float "
            "(the r10 hash_match=false root cause)"
        )


def test_q179_spark_matches_oracle(spark, sf_dir):
    import __spark_entry__ as entry

    name = "q179_sequence_packing"
    compare(entry.queries()[name](spark, sf_dir),
            entry.oracle_sql()[name], sf_dir)


# ---------------------------------------------------------------------------
# 2. Tokenizer count parity (Java regex vs RE2)
# ---------------------------------------------------------------------------

ADVERSARIAL_DOCS = [
    "plain words here",
    "",
    "   ",
    # exotic ASCII whitespace — \x0b/\x0c: Java \s includes both, RE2 \s
    # includes \f but NOT \x0b, so the engines take different paths
    # (replace-to-space vs keep-then-split) that must converge
    "\t\n\r\f\x0b",
    "a\x0bb c\x0cd",
    "nbsp\u00a0sep \u2003emsp \u200bzwsp",  # unicode spaces (non-\s in BOTH)
    "\u0130stanbul KELVIN\u212a sign",  # dotted-I / Kelvin-sign lowercasing
    "\u00e9clair cafe\u0301",  # precomposed vs combining accent
    "emoji \U0001f389 split \U0001f680\U0001f680 test",  # non-BMP surrogate pairs
    "\u00c5\u00e5 \u00df \u03a3\u0399\u03a3\u03a5\u03a6\u039f\u03a3",  # sharp-s, final sigma
    "semi;colon,comma.dot!bang?q",
    "under_score-hyphen'apostrophe",
    "digits123mixed456tokens",
    "  leading and trailing  ",
    "line\u2028sep\u2029next",  # unicode line/para separators
    "x" * 5000 + " tail",
    "a " * 300,
    "\uff46\uff55\uff4c\uff4c \uff21\uff22\uff23",  # fullwidth letters
    "\u00bd\u00be fractions \u00b7 middots \u2014 dashes",
    "tab\tsep\ttokens",
    "null\x00byte inside",
]


def test_token_count_parity_spark_vs_duckdb(spark, tmp_path):
    from iceberg_cache_spark.operators.text import tokens as spark_tokens
    from iceberg_cache_spark.plans.extensions import _DUCK_TOKS

    path = str(tmp_path / "adversarial.parquet")
    ids = list(range(len(ADVERSARIAL_DOCS)))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(ADVERSARIAL_DOCS, pa.string())}),
        path,
    )

    sdf = (
        spark.read.parquet(path)
        .select(
            "doc_id",
            F.size(spark_tokens(F.col("text"))).cast("bigint").alias("n"),
            spark_tokens(F.col("text")).alias("toks"),
        )
        .orderBy("doc_id")
    )
    s_rows = {r["doc_id"]: (r["n"], r["toks"]) for r in sdf.collect()}

    con = duckdb.connect()
    try:
        d_rows = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                f"SELECT doc_id, CAST(COALESCE(len(t), 0) AS BIGINT) AS n, t "
                f"FROM (SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t "
                f"FROM read_parquet('{path}')) ORDER BY doc_id"
            ).fetchall()
        }
    finally:
        con.close()

    for i, doc in enumerate(ADVERSARIAL_DOCS):
        sn, st = s_rows[i]
        dn, dt = d_rows[i]
        assert (sn, st) == (dn, dt), (
            f"tokenizer drift on doc {i} ({doc[:40]!r}): "
            f"spark n={sn} toks={st[:8]} vs duckdb n={dn} toks={dt[:8]} — "
            "one count difference shifts every q179 start_off after it"
        )


def test_fingerprint_and_punct_parity_spark_vs_duckdb(spark, tmp_path):
    """Same adversarial corpus, the other two mirrored fragments:
    operators.text.fingerprint() vs _DUCK_FP (md5 equality needs every
    BYTE identical — ASCII-only translate() lowering) and punct counts
    vs _DUCK_PUNCT (the \\x0B whitespace-class divergence)."""
    from iceberg_cache_spark.operators.text import WS_CLASS
    from iceberg_cache_spark.operators.text import fingerprint as spark_fp
    from iceberg_cache_spark.plans.extensions import _DUCK_FP, _DUCK_PUNCT

    docs = [d for d in ADVERSARIAL_DOCS if "\x00" not in d]  # md5 NUL ok but keep simple
    path = str(tmp_path / "adversarial_fp.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())}),
        path,
    )

    sdf = (
        spark.read.parquet(path)
        .select(
            "doc_id",
            spark_fp(F.col("text")).alias("fp"),
            (F.length("text") - F.length(
                F.regexp_replace("text", "[^A-Za-z0-9_" + WS_CLASS[1:], "")
            )).cast("bigint").alias("n_punct"),
        )
        .orderBy("doc_id")
    )
    s_rows = {r["doc_id"]: (r["fp"], r["n_punct"]) for r in sdf.collect()}

    con = duckdb.connect()
    try:
        d_rows = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                f"SELECT doc_id, {_DUCK_FP.format(c='text')} AS fp, "
                f"CAST(length(text) - length(regexp_replace(text, "
                f"'{_DUCK_PUNCT}', '', 'g')) AS BIGINT) AS n_punct "
                f"FROM read_parquet('{path}') ORDER BY doc_id"
            ).fetchall()
        }
    finally:
        con.close()

    for i, doc in enumerate(docs):
        assert s_rows[i] == d_rows[i], (
            f"fingerprint/punct drift on doc {i} ({doc[:40]!r}): "
            f"spark={s_rows[i]} duckdb={d_rows[i]}"
        )
