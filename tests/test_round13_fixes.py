"""Round-13 regression pins (VERDICT/ADVICE r12).

1. Throttle-robust calibration (VERDICT r12 #1 / Next #1): bench.py now
   takes TWO calibration readings (pre-suite, post-suite) and merges
   them min-drift with a >25%-disagreement `calibration_suspect` flag,
   because r12's single pre-suite child caught a measured host-throttle
   stall (cal_drift 1.366 against a clean suite) and poisoned the
   normalized read. merge_calibration's selection/flagging contract is
   pinned here.

2. e6 fixed-point overflow (ADVICE r12): q190/q191's share and rate
   products now run through DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
   intermediates — n_tokens * 1e6 wraps BIGINT at ~9.2e12 tokens,
   inside the 100 TB design point. Pinned by pushing ~1e13-token
   values through BOTH engines' expressions and checking exact Python
   integer arithmetic.

3. q191 mixture APPLY semantics: planted skew corpus (40x token
   imbalance) exercises full-epoch replication (n_epochs >= 10),
   fractional keep/drop, the rate-0 source drop, and the NULL doc_id /
   NULL source contracts — hash-matched against the oracle AND
   recomputed row-exactly in Python from the md5 idiom.

4. EAGER_QUERIES lockstep (VERDICT r12 #4/#7): the registry's declared
   side-effect list must match the actual _guarded_bench_spans call
   sites in plans/datapipe.py.

5. sf self-label (VERDICT r12 "What's wrong" #1): verify_contract's
   payload sf field derives from the verified directory, so the sf0.1
   snapshot can no longer self-report 0.01.

6. README gate-count lockstep (ADVICE r12): the NULL/empty/skew gate
   paragraphs' oracle-matched and N/N-green counts are parsed and
   pinned to len(ORACLE) / len(QUERIES).
"""

from __future__ import annotations

import hashlib
import importlib.util
import inspect
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import bench
from iceberg_cache_spark.plans import EAGER_QUERIES, ORACLE, QUERIES
from tests.oracle import compare

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# 1. merge_calibration
# ---------------------------------------------------------------------------


def _reading(drift):
    return {"queries": {}, "drift_ratio": drift, "matmul_sec": 1.0}


def test_merge_calibration_takes_min_drift_and_flags_disagreement():
    m = bench.merge_calibration(_reading(1.4), _reading(1.05))
    assert m["drift_ratio"] == 1.05
    assert m["chosen"] == "post"
    assert m["calibration_suspect"] is True  # 1.4/1.05 > 1.25
    assert m["pre_post_ratio"] == round(1.4 / 1.05, 3)


def test_merge_calibration_quiet_pair_not_suspect():
    m = bench.merge_calibration(_reading(1.15), _reading(1.08))
    assert m["drift_ratio"] == 1.08
    assert m["chosen"] == "post"
    assert m["calibration_suspect"] is False


def test_merge_calibration_pre_wins_when_smaller():
    m = bench.merge_calibration(_reading(1.02), _reading(1.9))
    assert m["drift_ratio"] == 1.02
    assert m["chosen"] == "pre"
    assert m["calibration_suspect"] is True


def test_merge_calibration_single_or_no_ratio():
    # non-sf0.1 runs record None ratios: no drift, never suspect
    m = bench.merge_calibration(_reading(None), _reading(1.1))
    assert m["drift_ratio"] == 1.1 and m["calibration_suspect"] is False
    m = bench.merge_calibration(_reading(None), _reading(None))
    assert m["drift_ratio"] is None and m["calibration_suspect"] is False


def test_merge_calibration_preserves_both_readings():
    pre, post = _reading(1.3), _reading(1.0)
    m = bench.merge_calibration(pre, post)
    assert m["pre"] is pre and m["post"] is post  # arbitration evidence


def test_compact_line_emits_cal_suspect_only_when_fired():
    """The stdout line carries cal_suspect ONLY when the flag fires —
    the healthy case would spend a cheap-tail query's chars on saying
    nothing (the r13 first cut did exactly that and pushed omissions
    past max_omitted on the committed payload)."""
    base = {
        "metric": "m", "value": 1.0, "unit": "sec", "queries": {"q01_x": 1.0},
        "sf": 0.1, "spread_ok": {"q01_x": True},
    }
    clean = dict(base, calibration={"drift_ratio": 1.1,
                                    "calibration_suspect": False})
    assert "cal_suspect" not in bench.compact_line(clean)
    fired = dict(base, calibration={"drift_ratio": 1.1,
                                    "calibration_suspect": True})
    assert bench.compact_line(fired)["cal_suspect"] is True


# ---------------------------------------------------------------------------
# 2. e6 fixed-point overflow (ADVICE r12)
# ---------------------------------------------------------------------------

# ~1e13-token source: the old BIGINT product n_tokens * 1e6 = 9.3e18
# wraps int64 (max 9.22e18); the DECIMAL/HUGEINT path must not.
BIG = {"n_tokens": 9_300_000_000_000, "total_tokens": 27_900_000_000_000,
       "n_sources": 3}
BIG_SHARE = BIG["n_tokens"] * 1_000_000 // BIG["total_tokens"]  # 333333
BIG_RATE = (BIG["total_tokens"] * 1_000_000
            // (BIG["n_sources"] * BIG["n_tokens"]))  # 1000000


def test_spark_decimal_e6_products_survive_1e13_tokens(spark):
    row = spark.createDataFrame(
        [(BIG["n_tokens"], BIG["total_tokens"], BIG["n_sources"])],
        "n_tokens long, total_tokens long, n_sources long",
    )
    got = row.selectExpr(
        "CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000"
        " DIV total_tokens AS BIGINT) AS share",
        "CAST(CAST(total_tokens AS DECIMAL(38,0)) * 1000000"
        " DIV (CAST(n_sources AS DECIMAL(38,0)) * n_tokens)"
        " AS BIGINT) AS rate",
    ).collect()[0]
    assert got["share"] == BIG_SHARE
    assert got["rate"] == BIG_RATE


def test_duckdb_hugeint_e6_products_survive_1e13_tokens():
    import duckdb

    share, rate = duckdb.sql(
        f"SELECT CAST(CAST({BIG['n_tokens']} AS HUGEINT) * 1000000"
        f" // {BIG['total_tokens']} AS BIGINT),"
        f" CAST(CAST({BIG['total_tokens']} AS HUGEINT) * 1000000"
        f" // (CAST({BIG['n_sources']} AS HUGEINT) * {BIG['n_tokens']})"
        f" AS BIGINT)"
    ).fetchone()
    assert (share, rate) == (BIG_SHARE, BIG_RATE)


def test_q190_oracle_uses_hugeint_and_plan_uses_decimal():
    """The committed SQL/plan must keep the 128-bit intermediates."""
    assert "HUGEINT" in ORACLE["q190_source_mixture_plan"]
    assert "HUGEINT" in ORACLE["q191_source_mixture_apply"]
    import iceberg_cache_spark.plans.datapipe as dp

    # q191's rate arithmetic lives in the shared _mixture_front since
    # the q194 audit landed; the pin follows the expression.
    for fn in (dp.q190, dp._mixture_front):
        src = inspect.getsource(fn)
        assert "DECIMAL(38,0)" in src, f"{fn.__name__} lost the wide cast"


# ---------------------------------------------------------------------------
# 3. q191 planted semantics
# ---------------------------------------------------------------------------


def _write_mix_documents(path: str) -> None:
    rows = []  # (doc_id, source, text)
    # "big": 8 docs x 100 tokens -> 800 tokens (downsample candidate)
    for k in range(8):
        rows.append((100 + k, "big", " ".join(f"w{k}t{i}" for i in range(100))))
    # "small": 2 docs x 10 tokens -> 20 tokens (heavy upsample)
    for k in range(2):
        rows.append((200 + k, "small", " ".join(f"s{k}t{i}" for i in range(10))))
    # "empty": NULL text -> 0 tokens -> rate 0 -> dropped entirely
    rows.append((300, "empty", None))
    # NULL source: counts toward totals, drops at the rate join.
    # Sized to 780 tokens so total = 1600 and rate(big) = 500000 —
    # the fractional threshold splits the 8 big docs 5 kept / 3
    # dropped on their md5 uniforms (computed in _expected_mix_rows).
    rows.append((400, None, " ".join(f"u{i}" for i in range(780))))
    # NULL doc_id: excluded up front (triad contract)
    rows.append((None, "big", "ghost doc with no identity"))
    ids = [r[0] for r in rows]
    srcs = [r[1] for r in rows]
    texts = [r[2] for r in rows]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )


@pytest.fixture(scope="module")
def mix_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("mix_apply")
    _write_mix_documents(str(d))
    return str(d)


def _u_e6(doc_id: int) -> int:
    h = hashlib.md5(f"{doc_id}:mix".encode()).hexdigest()[:15]
    return int(h, 16) % 1_000_000


def _expected_mix_rows() -> list[tuple[int, str, int, int]]:
    """Python recomputation of the q191 contract on the planted corpus."""
    tokens = {"big": 800, "small": 20, "empty": 0, None: 780}
    total, n_sources = sum(tokens.values()), len(tokens)
    out = []
    for src, docs in (("big", range(100, 108)), ("small", range(200, 202))):
        rate = total * 1_000_000 // (n_sources * tokens[src])
        for doc in docs:
            n_epochs = rate // 1_000_000 + (
                1 if _u_e6(doc) < rate % 1_000_000 else 0
            )
            out.extend(
                (doc, src, n_epochs, e) for e in range(n_epochs)
            )
    return sorted(out)


def test_q191_planted_upsample_downsample_exact(spark, mix_dir):
    got = sorted(
        (r.doc_id, r.source, r.n_epochs, r.epoch)
        for r in QUERIES["q191_source_mixture_apply"](spark, mix_dir).collect()
    )
    exp = _expected_mix_rows()
    assert got == exp
    # the fixture is non-vacuous: the "small" source replicates to 20
    # full epochs (rate 20e6), and the "big" source's fractional
    # threshold (rate 500000) splits its 8 docs BOTH ways
    assert all(n == 20 for (_, s, n, _) in exp if s == "small")
    kept_big = {d for (d, s, _, _) in exp if s == "big"}
    assert kept_big == {100, 102, 105, 106, 107}  # 5 kept, 3 dropped
    # sources "empty" (rate 0) and NULL never appear; nor the NULL id
    assert all(s in ("big", "small") for (_, s, _, _) in exp)


def test_q191_planted_hash_matches_oracle(spark, mix_dir):
    compare(
        QUERIES["q191_source_mixture_apply"](spark, mix_dir),
        ORACLE["q191_source_mixture_apply"],
        mix_dir,
    )


# ---------------------------------------------------------------------------
# 4. EAGER_QUERIES lockstep
# ---------------------------------------------------------------------------


def test_eager_queries_match_guarded_call_sites():
    import iceberg_cache_spark.plans.datapipe as dp

    actual = set()
    for name, fn in QUERIES.items():
        if getattr(fn, "__module__", "") != dp.__name__:
            continue
        if "_guarded_bench_spans(" in inspect.getsource(fn):
            actual.add(name)
    assert actual == set(EAGER_QUERIES), (
        "EAGER_QUERIES drifted from the _guarded_bench_spans call sites "
        f"— registry says {sorted(EAGER_QUERIES)}, source says "
        f"{sorted(actual)}; update plans/__init__.py's contract note"
    )


def test_eager_queries_documented_in_module_docstring():
    import iceberg_cache_spark.plans as plans

    assert "EAGER" in (plans.__doc__ or "")
    assert "EAGER_QUERIES" in (plans.__doc__ or "")


# ---------------------------------------------------------------------------
# 5. verify_contract sf self-label
# ---------------------------------------------------------------------------


def _load_verify_contract(monkeypatch, sf_dir: str):
    monkeypatch.setenv("SPARK_GRAFT_VERIFY_SF", sf_dir)
    spec = importlib.util.spec_from_file_location(
        "verify_contract_under_test",
        os.path.join(REPO, "tools", "verify_contract.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_verify_contract_sf_field_derives_from_directory(monkeypatch):
    m01 = _load_verify_contract(monkeypatch, "/root/testdata/sf0.01")
    assert m01.SF_VALUE == 0.01 and m01.OUT.endswith(".json")
    assert "_sf" not in os.path.basename(m01.OUT)
    m10 = _load_verify_contract(monkeypatch, "/root/testdata/sf0.1")
    assert m10.SF_VALUE == 0.1
    assert m10.OUT.endswith("_sf0.1.json")


def test_verify_contract_payload_literal_gone():
    with open(os.path.join(REPO, "tools", "verify_contract.py")) as fh:
        src = fh.read()
    assert '"sf": 0.01' not in src, "hardcoded sf label is back"
    assert '"sf": SF_VALUE' in src


# ---------------------------------------------------------------------------
# 7. q192/q193 cluster-safe split planted semantics
# ---------------------------------------------------------------------------

BASE = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango")


def _write_split_documents(path: str) -> None:
    """Docs 12/13 are near-duplicates (one token differs -> 3-gram
    Jaccard ~0.84 >= 0.5, one dup pair, cluster id 12). Chosen so the
    CLUSTER hash sends both to train (u(12:split)=583708 < 900000)
    while a naive PER-DOC hash would exile doc 13 to test
    (u(13:split)=911759) — the exact leakage q192 exists to prevent.
    Docs 500/501 are train singletons, 508 a test singleton
    (u=905199... >= 900000), all with disjoint vocabularies."""
    rows = [
        (12, BASE),
        (13, BASE.replace("tango", "uniform")),
        (500, "one two three four five six seven eight nine ten"),
        (501, "red orange yellow green blue indigo violet pink brown black"),
        (508, "cat dog bird fish horse mouse rabbit snake turtle wolf"),
    ]
    ids = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["planted"] * len(rows), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )


@pytest.fixture(scope="module")
def split_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("cluster_split")
    _write_split_documents(str(d))
    return str(d)


def _u_split(x: int) -> int:
    h = hashlib.md5(f"{x}:split".encode()).hexdigest()[:15]
    return int(h, 16) % 1_000_000


def test_q192_cluster_moves_as_one_unit(spark, split_dir):
    # the fixture is non-vacuous: a per-doc hash WOULD split the pair
    assert _u_split(12) < 900_000 <= _u_split(13)
    got = {
        r.doc_id: (r.cluster_id, r.split)
        for r in QUERIES["q192_cluster_safe_split"](spark, split_dir).collect()
    }
    assert got[12] == (12, "train") and got[13] == (12, "train")
    assert got[500] == (500, "train") and got[501] == (501, "train")
    assert got[508] == (508, "test")


def test_q192_q193_planted_hash_match_oracle(spark, split_dir):
    for name in ("q192_cluster_safe_split", "q193_split_leakage_audit"):
        compare(QUERIES[name](spark, split_dir), ORACLE[name], split_dir)


def test_q193_zero_cross_split_pairs(spark, split_dir):
    rows = {
        r.split: r
        for r in QUERIES["q193_split_leakage_audit"](spark, split_dir).collect()
    }
    assert rows["train"].cross_split_pairs == 0
    assert rows["test"].cross_split_pairs == 0
    assert rows["train"].n_docs == 4 and rows["test"].n_docs == 1
    assert rows["train"].n_clusters == 3  # {12,13}, {500}, {501}


# ---------------------------------------------------------------------------
# 6. README gate-count lockstep (ADVICE r12)
# ---------------------------------------------------------------------------


def test_readme_gate_counts_lockstep():
    with open(os.path.join(REPO, "README.md")) as fh:
        txt = fh.read()
    n_q, n_o = len(QUERIES), len(ORACLE)
    # every "N oracle-matched" mention in the gate paragraphs
    for m in re.finditer(r"(\d+) oracle-matched", txt):
        assert int(m.group(1)) == n_o, (
            f"README says '{m.group(0)}'; registry has {n_o} oracles"
        )
    # every "N/N green" gate claim
    for m in re.finditer(r"(\d+)/(\d+) green", txt):
        assert int(m.group(1)) == n_q and int(m.group(2)) == n_q, (
            f"README says '{m.group(0)}'; registry has {n_q} queries"
        )
