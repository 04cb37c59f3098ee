"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k (broadcast the query set; one pass
over the corpus; per-query top-k via window rank).

Scale path: random-hyperplane LSH — bucket vectors by sign pattern of a
fixed seeded projection set, then search only matching buckets. The
hyperplanes are generated from a deterministic seed and shipped as plan
literals (no driver-side state, no UDF).

Determinism: reported similarities accumulate through DECIMAL(28,12) of
the per-element double product — exact and order-independent, identical
on a 1000-executor cluster and in the DuckDB oracle.

Performance: norms are computed once per vector (not once per pair),
and threshold operators pre-filter with a cheap double-fold dot (also
deterministic: fixed fold order), rescoring only survivors exactly —
the exact-decimal path runs on a tiny fraction of the pair space.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

PDEC = "decimal(28,12)"


def _exact_dot(a: Column, b: Column) -> Column:
    """Order-independent dot product: Σ decimal(double(x)*double(y))."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(PDEC)
    )
    # merge result must keep the accumulator's exact decimal type
    # (decimal + decimal widens precision, which aggregate() rejects)
    return F.aggregate(
        prods, F.lit(0).cast(PDEC), lambda acc, v: (acc + v).cast(PDEC)
    ).cast("double")


def _fast_dot(a: Column, b: Column) -> Column:
    """Double-fold dot: deterministic (fixed order) but not decimal-exact.
    Used only as a pre-filter with an epsilon margin."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(_exact_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _exact_dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, vec_id, sim, rnk).

    The query side is broadcast; the corpus is scanned once with its
    norm computed once per vector. At large n, pre-prune with
    ``lsh_cosine_topk``.
    """
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        id_col, vec_col, _norm(F.col(vec_col)).alias("c_norm")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        (
            F.round(
                _exact_dot(F.col(vec_col), F.col("q_vec"))
                / (F.col("c_norm") * F.col("q_norm")),
                6,
            )
            + 0.0  # normalize IEEE -0.0 (engines disagree on its sign)
        ).alias("sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "sim", "rnk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit hyperplanes (seeded PRNG, driver-independent)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def with_lsh_bucket(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """Attach a sign-pattern LSH bucket id (int in [0, 2^n_planes)).
    The sign test uses the double fold — deterministic, and exactness
    doesn't matter for bucketing."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        d = _fast_dot(F.col(vec_col), lit_plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("lsh_bucket", bucket)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. Recall < 1 by design; at 100 TB this turns a full-corpus
    scan per query into a bucket-pruned probe (buckets can be the
    table's partition key so pruning happens at the file level)."""
    c = with_lsh_bucket(corpus, vec_col, dim, n_planes).select(
        id_col, vec_col, "lsh_bucket", _norm(F.col(vec_col)).alias("c_norm")
    )
    q = with_lsh_bucket(queries, vec_col, dim, n_planes).select(
        F.col(query_id_col),
        F.col(vec_col).alias("q_vec"),
        "lsh_bucket",
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    scored = c.join(F.broadcast(q), "lsh_bucket").select(
        query_id_col,
        id_col,
        (
            F.round(
                _exact_dot(F.col(vec_col), F.col("q_vec"))
                / (F.col("c_norm") * F.col("q_norm")),
                6,
            )
            + 0.0  # normalize IEEE -0.0 (engines disagree on its sign)
        ).alias("sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "sim", "rnk")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 4,
) -> DataFrame:
    """Near-duplicate vector pairs by cosine ≥ threshold, LSH-bucketed
    so the self-join is per-bucket instead of n². Survivor pairs of a
    cheap double prefilter (threshold − 1e-6 margin) are rescored with
    the exact decimal dot before the final threshold test."""
    b = with_lsh_bucket(df, vec_col, dim, n_planes).select(
        F.col(id_col), F.col(vec_col), "lsh_bucket", _norm(F.col(vec_col)).alias("nrm")
    )
    a = b.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        F.col("nrm").alias("n_a"),
        "lsh_bucket",
    )
    c = b.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        F.col("nrm").alias("n_b"),
        "lsh_bucket",
    )
    fast_sim = _fast_dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
    return (
        a.join(c, "lsh_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(fast_sim >= threshold - 1e-6)
        .select(
            "id_a",
            "id_b",
            (
                F.round(
                    _exact_dot(F.col("v_a"), F.col("v_b"))
                    / (F.col("n_a") * F.col("n_b")),
                    6,
                )
                + 0.0
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .distinct()
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantization + probed search
# ---------------------------------------------------------------------------


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out: str = "ivf_cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (argmin L2 via the
    double fold — deterministic). Centroids ship as plan literals."""
    best_id, best_d = None, None
    for cid, cvec in centroids:
        lit_c = F.array(*[F.lit(float(x)) for x in cvec])
        d = F.aggregate(
            F.zip_with(
                F.col(vec_col), lit_c, lambda x, y: (x.cast("double") - y) ** 2
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if best_id is None:
            best_id, best_d = F.lit(cid), d
        else:
            best_id = F.when(d < best_d, F.lit(cid)).otherwise(best_id)
            best_d = F.least(d, best_d)
    return df.withColumn(out, best_id)


def ivf_centroids_from_sample(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse centroids: per hash bucket, the vector with
    the smallest id (a seeding pass; k-means refinement is an optional
    offline job — the *index structure* is what matters for the probe
    path). One partial-aggregating hash aggregate — map-side combine
    reduces each task to ≤n_cells rows before the shuffle, so the job
    scales with the corpus like any groupBy, with **no** single-digit-
    partition window sort (the previous row_number().over(partitionBy
    (_b)) funneled the whole corpus through n_cells sort tasks). The
    result is n_cells rows — a legitimate driver-side collect, broadcast
    into the plan as literals."""
    rows = (
        corpus.select(id_col, vec_col)
        .withColumn("_b", F.abs(F.xxhash64(F.col(id_col).cast("string"))) % n_cells)
        .groupBy("_b")
        .agg(F.min_by(F.col(vec_col), F.col(id_col)).alias(vec_col))
        .collect()
    )
    return [(int(r["_b"]), [float(x) for x in r[vec_col]]) for r in rows]


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF probe: score only corpus vectors in the query's ``n_probe``
    nearest cells. At 100 TB the corpus is *partitioned by ivf_cell*, so
    a probe is file-level pruning + a small scan, not a full pass."""
    c = ivf_assign(corpus, centroids, vec_col).select(
        id_col, vec_col, "ivf_cell", _norm(F.col(vec_col)).alias("c_norm")
    )
    # query → its n_probe nearest centroids (explode into probe rows)
    probe_structs = []
    for cid, cvec in centroids:
        lit_c = F.array(*[F.lit(float(x)) for x in cvec])
        d = F.aggregate(
            F.zip_with(
                F.col(vec_col), lit_c, lambda x, y: (x.cast("double") - y) ** 2
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        probe_structs.append(F.struct(d.alias("d"), F.lit(cid).alias("cell")))
    probes = F.slice(F.array_sort(F.array(*probe_structs)), 1, n_probe)
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
        F.explode(F.transform(probes, lambda p: p["cell"])).alias("ivf_cell"),
    )
    scored = c.join(F.broadcast(q), "ivf_cell").select(
        query_id_col,
        id_col,
        (
            F.round(
                _exact_dot(F.col(vec_col), F.col("q_vec"))
                / (F.col("c_norm") * F.col("q_norm")),
                6,
            )
            + 0.0
        ).alias("sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "sim", "rnk")
    )


# ---------------------------------------------------------------------------
# Storage-side embedding transforms
# ---------------------------------------------------------------------------


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max |x|, code =
    round_half_up(x / scale * 127). 4x storage reduction for ANN
    shortlists; codes + scale reconstruct within 1/254 relative error.
    FLOOR(v + 0.5) keeps rounding portable (engines' round/cast-to-int
    conventions differ)."""
    absmax = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    df = df.withColumn("q_scale", F.when(absmax > 0, absmax).otherwise(F.lit(1.0)))
    codes = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") / F.col("q_scale") * 127 + 0.5).cast("int"),
    )
    return df.withColumn("q_codes", codes)


def random_projection(
    df: DataFrame, vec_col: str, dim: int, out_dim: int = 8, seed: int = 42
) -> DataFrame:
    """Johnson–Lindenstrauss-style dense random projection to
    ``out_dim`` dims using the deterministic seeded hyperplanes (plan
    literals, exact-decimal dots) — the cheap pre-step before clustering
    or coarse ANN over very wide embeddings."""
    planes = _hyperplanes(dim, out_dim, seed)
    cols = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        cols.append(
            (F.round(_exact_dot(F.col(vec_col), lit_plane), 6) + 0.0).alias(f"p{i}")
        )
    return df.select("*", *cols)
