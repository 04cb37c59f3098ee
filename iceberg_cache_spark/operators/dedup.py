"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (100 TB):
- Exact dedup is a hash-aggregate on the content key — one shuffle,
  map-side partial aggregation.
- MinHash: explode shingles → groupBy(doc) with 64 partial-aggregated
  mins (one shuffle by doc id); LSH banding turns the O(n²) pair space
  into per-bucket self-joins. AQE skew-join splits hot buckets.
- SimHash: 64 bit-wise conditional sums per doc, then banded on 16-bit
  chunks (any pair within Hamming distance 3 shares ≥1 of 4 chunks).
- All hashes are xxhash64 (JVM, seed-stable) — signatures are
  deterministic across partitionings and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from iceberg_cache_spark.operators.materialize import (
    materialize,
    spread_scan,
    unmaterialize,
)
from iceberg_cache_spark.operators.text import tokens


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Keep one deterministic representative (min id) per key group.

    Unlike ``dropDuplicates`` (keeps an arbitrary row), min-id keeps the
    result stable across partitionings — required for oracle matching
    and for reproducible pipeline runs.
    """
    return df.groupBy(*keys).agg(F.min(id_col).alias(id_col))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _prefilter_threshold(threshold: float) -> float:
    """Conservative size-ratio prefilter threshold.

    The length prefilter prunes pair (a, b) when ``sz_a * t > sz_b`` —
    valid because J <= min/max. But ``sz_a * t`` is evaluated in IEEE
    doubles: for a threshold whose binary expansion rounds UP (0.3 →
    0.30000000000000004), ``10 * 0.3 = 3.0000000000000004 > 3`` prunes
    a subset pair whose exact Jaccard equals the threshold — the final
    (authoritative) Jaccard filter would have kept it. Slacking the
    prefilter by 1e-4 makes it strictly weaker than the final filter
    for any gram-set size below ~10^4/ulp: it covers double rounding of
    both the multiply and the ``round(J, 4)`` comparison window, while
    costing essentially no pruning power (0.01% of the ratio band).
    The exact final filter remains the only semantic gate."""
    return max(threshold - 1e-4, 0.0)


def shingles_of(toks: Column, k: int = 3) -> Column:
    """Distinct word k-shingles from a *bound* token-array column.

    ``toks`` must be a real column reference (``F.col``), not an inline
    expression: anything inside the transform lambda is re-evaluated per
    shingle index, so an inlined tokenizer goes quadratic per row."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    )


def with_shingles(df: DataFrame, text_col: str, k: int = 3, out: str = "_sh") -> DataFrame:
    """Attach a shingle-array column, tokenizing exactly once per row."""
    return (
        df.withColumn("_toks", tokens(F.col(text_col)))
        .withColumn(out, shingles_of(F.col("_toks"), k))
        .drop("_toks")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) — explode + partial-agg mins."""
    # explode_outer, not explode: plain explode makes Catalyst infer a
    # size(_sh)>0 filter and push it below the projection with the whole
    # shingle expression inlined — re-tokenizing per shingle index.
    #
    # spread_scan (round 13): the tokenize+shingle+64-hash partial
    # aggregation is per-row compute charged to the SCAN stage — an
    # under-parallel source serializes it (no-op on an already-parallel
    # scan; see the helper).
    sh = (
        with_shingles(spread_scan(df, id_col), text_col, shingle_k)
        .select(F.col(id_col), F.explode_outer(F.col("_sh")).alias("s"))
        .filter(F.col("s").isNotNull())
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"h{i}") for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", bands: int = 16, rows: int = 4
) -> DataFrame:
    """Banded LSH: docs sharing any band-hash become a candidate pair.

    One explode (×bands) + a per-bucket self-join — never the full n².
    """
    banded = sig_df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.lit(b), F.slice("sig", b * rows + 1, rows)).alias(
                            "bh"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bh")
    a = banded.withColumnRenamed(id_col, "id_a")
    b = banded.withColumnRenamed(id_col, "id_b")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Estimated Jaccard = fraction of agreeing minhash components."""
    agree = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return agree / F.size(sig_a)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, est_jaccard) above threshold.

    The signature table is materialized once (``materialize``: reliable
    checkpoint on clusters, localCheckpoint locally): it
    feeds banding plus both verify sides, and an unmaterialized plan
    recomputes the 64-minhash aggregation — the dominant cost — per
    consumer (4 corpus passes in the audited plan)."""
    rows = num_hashes // bands
    sig = materialize(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    )
    cand = lsh_candidate_pairs(sig, id_col, bands, rows)
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(minhash_jaccard(F.col("sig_a"), F.col("sig_b")), 4).alias(
                "est_jaccard"
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc: sign of per-bit weighted sums of token
    hashes. Pure aggregate — one shuffle by doc id. spread_scan: the
    tokenize+explode+64 bit-sum partials are scan-stage compute (see
    minhash_signatures)."""
    df = spread_scan(df, id_col)
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t")
    ).withColumn("h", F.xxhash64("t"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = tok.groupBy(id_col).agg(*bit_sums)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(
            F.lit(0).cast("bigint")
        )
        sim = bit if sim is None else sim + bit
    return sums.select(F.col(id_col), sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 2000,
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` (≤ 4 chunks ⇒ any
    pair at distance ≤3 collides on at least one 16-bit chunk).

    Signatures materialize once (both self-join sides re-derive from
    the same 64-bit-sum aggregate — the dominant cost).

    Scale guards (added after the round-4 scale probe caught a 32x
    blowup at 10x corpus on Zipf-realistic text):

    - the Hamming filter runs BEFORE the pair ``distinct`` — candidate
      pairs stream out of the bucket join, are bit-counted, and the
      overwhelming majority (far pairs) die before the dedup shuffle
      instead of after it (identical output, the distinct's input drops
      by orders of magnitude);
    - ``(chunk, value)`` buckets larger than ``max_bucket`` docs are
      dropped from candidate generation (standard LSH hot-bucket
      capping): a bucket of b docs streams b² join rows, and hot
      buckets arise exactly where a 16-bit chunk carries no signal
      (head-heavy token distributions push whole corpora toward the
      same chunk values). Pairs whose ONLY shared chunk is a dropped
      mega-bucket are lost — bounded, documented recall cost on a
      declared-approximate operator."""
    sim = materialize(simhash64(df, id_col, text_col))
    return hamming_band_pairs(
        sim, id_col, "simhash", max_hamming=max_hamming, max_bucket=max_bucket
    )


def hamming_band_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    group_cols: tuple[str, ...] = (),
    max_hamming: int = 3,
    max_bucket: int = 2000,
) -> DataFrame:
    """Banded Hamming pair join over ANY 64-bit hash column (round 10:
    extracted verbatim from :func:`simhash_pairs` so the perceptual
    media tier reuses the identical, driver-certified banding instead
    of a second copy). Any pair at Hamming distance ≤3 shares at least
    one of the four 16-bit chunks; ``group_cols`` (e.g. modality) are
    added to the bucket key and carried into the output, so pairs
    never cross groups. Same scale guards as documented above: the
    Hamming filter runs before the pair ``distinct``, and hot
    ``(chunk, value)`` buckets past ``max_bucket`` are dropped from
    candidate generation."""
    gc = list(group_cols)
    keys = gc + ["chunk", "cv"]
    chunks = df.select(
        F.col(id_col),
        F.col(hash_col).alias("_hh"),
        *gc,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(hash_col, c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "_hh", *gc, "ck.chunk", "ck.cv")
    bucket_ok = (
        chunks.groupBy(*keys)
        .agg(F.count("*").alias("bsz"))
        .filter(F.col("bsz") <= max_bucket)
        .select(*keys)
    )
    chunks = chunks.join(bucket_ok, keys, "left_semi")
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col("_hh").alias("sh_a"), *keys
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col("_hh").alias("sh_b"), *keys
    )
    return (
        a.join(b, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            *gc,
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Word-n-gram Jaccard similarity for every pair sharing at least
    one n-gram (inverted-index join, not a cartesian product).

    Grams appearing in more than ``max_doc_freq`` documents are dropped
    from the gram space before sizes/intersections (standard stop-gram
    filtering): a gram shared by d docs contributes d² join pairs, so
    without the cap the inverted-index join degenerates to ~n² on
    boilerplate-heavy corpora. Jaccard is exact over the filtered gram
    space, and the cap bounds every join bucket at 100 TB.

    SET semantics throughout: ``shingles_of`` applies ``array_distinct``
    per document, so each doc contributes each gram AT MOST ONCE —
    ``groupBy(gh).count()`` is true document frequency, and sizes /
    intersections are distinct-gram-set sizes, exactly the oracle's
    ``SELECT DISTINCT doc_id, g`` semantics even for documents with
    internally repeated n-grams (regression-tested with repeated-gram
    fixtures in tests/test_round5_fixes.py)."""
    # join/aggregate on the 8-byte gram hash, not the gram string: the
    # shuffle carries fixed-width keys (64-bit collision odds ~1e-8 at
    # 100M distinct grams — negligible vs. the bandwidth saved)
    # explode_outer + null-filter: see minhash_signatures comment
    # spread_scan: tokenize+shingle+explode are scan-stage compute
    # (no-op on an already-parallel scan; see minhash_signatures)
    grams = (
        with_shingles(spread_scan(df, id_col), text_col, n)
        .select(F.col(id_col), F.explode_outer(F.col("_sh")).alias("g"))
        .filter(F.col("g").isNotNull())
        .select(id_col, F.xxhash64("g").alias("gh"))
    )
    # Document frequency and per-doc gram-set size as WINDOW counts
    # (round 13): each agg+join-back pair (dfreq keyed by gh, sz keyed
    # by id) collapses into one unordered window count over its key —
    # one exchange each instead of agg-exchange + join-back exchange
    # (operations keyed the same way share one exchange). Identical
    # values: an unordered window count over a partition equals the
    # groupBy count joined back on the key.
    kept = (
        grams.withColumn("dfreq", F.count("*").over(W.partitionBy("gh")))
        .filter(F.col("dfreq") <= max_doc_freq)
        .select(id_col, "gh")
    )
    # Carry each side's gram-set size INTO the bucket join (8 extra
    # bytes/row) so two pruning steps run before the intersection
    # aggregate instead of after it: (1) pairs whose size ratio is
    # below the threshold can never reach it (inter <= min, union >=
    # max => J <= min/max) and die before the groupBy shuffle; (2)
    # grouping by (ids, sizes) — sizes are functionally dependent on
    # ids — deletes the two post-aggregation join-backs the previous
    # plan paid. Output identical; two shuffles and the worst of the
    # pair fan-out gone (round-4 scale-probe finding).
    #
    # materialize-once, moved to the LAST shared frame (round 13): with
    # the window rewrite the posting list is a single linear chain up
    # to here, and the self-join's two legs are the only repeated
    # readers — checkpointing kept_sz (same width as the old grams
    # checkpoint) removes one full corpus recompute per leg while
    # paying the barrier once. eager=False: the consumer's own job
    # fills the blocks (both legs read every partition; the block
    # manager computes each partition once). Without a checkpoint
    # Catalyst re-tokenizes and re-shingles the corpus once per leg
    # (~20 scans, zero ReusedExchange in the audited plan). On a
    # cluster swap for persist(MEMORY_AND_DISK) + checkpoint for
    # fault tolerance.
    kept_sz = materialize(
        kept.withColumn("sz", F.count("*").over(W.partitionBy(id_col))),
        eager=False,
    )
    a = kept_sz.select(
        F.col(id_col).alias("id_a"), "gh", F.col("sz").alias("sz_a")
    )
    b = kept_sz.select(
        F.col(id_col).alias("id_b"), "gh", F.col("sz").alias("sz_b")
    )
    # _prefilter_threshold: 1e-4 slack so IEEE rounding of sz*t can
    # never prune a pair the exact final Jaccard filter would keep
    # (threshold=0.3, sz 10 vs 3: 10*0.3 -> 3.0000000000000004).
    pf = _prefilter_threshold(threshold)
    inter = (
        a.join(b, "gh")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (F.col("sz_a") * pf <= F.col("sz_b"))
            & (F.col("sz_b") * pf <= F.col("sz_a"))
        )
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_ppjoin(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs ≥ num/den via prefix filtering
    (PPJoin-style; public algorithm from Chaudhuri et al. / Xiao et al.).

    Every doc's grams are ordered by ascending global document frequency
    (rarest first); if J(A,B) ≥ t, A and B must share a gram within the
    first |A| − ⌈t·|A|⌉ + 1 grams of that order. Only *prefix* grams
    enter the inverted-index join, so candidate fan-out is bounded by
    rare-gram frequencies instead of Σ df² over all grams — the exact
    counterpart of the df-capped variant, with no semantic cut.

    The threshold is a rational (num/den) and all prefix arithmetic is
    integer — a float ⌈t·sz⌉ can round up past the true value and
    silently drop qualifying pairs.

    Round 13 (same treatment as ngram_jaccard_pairs): document
    frequency is an unordered window count over gh, and rank + gram-set
    size share ONE id-keyed window exchange (row_number ordered by
    (dfreq, gh) plus an unordered count over the same partition) —
    replacing the dfreq aggregate + join-back, the rank join, and the
    sizes aggregate + join-back (an unordered window count over a
    partition equals the groupBy count joined back on the key). The
    enriched posting list (id, gh, sz, rnk) is then materialized once:
    it feeds four consumers (both prefix-join sides, both verify
    sides), and an unmaterialized plan re-tokenizes the corpus per
    consumer (audited: ~20 scans, no ReusedExchange). Pair sizes ride
    the candidate rows as grouping keys, deleting the two
    post-aggregation size join-backs. Output identical.
    """
    # spread_scan: see minhash_signatures (round 13)
    grams = (
        with_shingles(spread_scan(df, id_col), text_col, n)
        .select(F.col(id_col), F.explode_outer(F.col("_sh")).alias("g"))
        .filter(F.col("g").isNotNull())
        .select(id_col, F.xxhash64("g").alias("gh"))
    )
    w_id = W.partitionBy(id_col)
    grams = materialize(
        grams.withColumn("dfreq", F.count("*").over(W.partitionBy("gh")))
        .withColumn("rnk", F.row_number().over(w_id.orderBy("dfreq", "gh")))
        .withColumn("sz", F.count("*").over(w_id)),
        eager=False,
    )
    num, den = F.lit(threshold_num), F.lit(threshold_den)
    # integer ceil(t*sz) = (num*sz + den - 1) div den
    prefix_len = F.col("sz") - ((num * F.col("sz") + den - 1) / den).cast("bigint") + 1
    prefix = grams.filter(F.col("rnk") <= prefix_len).select(
        id_col, "gh", "sz", "rnk"
    )

    a = prefix.select(
        F.col(id_col).alias("id_a"),
        "gh",
        F.col("sz").alias("sz_a"),
        F.col("rnk").alias("rnk_a"),
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"),
        "gh",
        F.col("sz").alias("sz_b"),
        F.col("rnk").alias("rnk_b"),
    )
    # POSITIONAL filter (the second P of PPJoin): both docs rank grams
    # in the same global (dfreq, gh) order, so a shared gram at
    # positions (pa, pb) bounds the remaining possible overlap by
    # 1 + min(sz_a - pa, sz_b - pb). A qualifying pair needs overlap
    # >= ceil(num*(sz_a+sz_b)/(num+den)) [J>=t  =>  O >= t/(1+t)*(sa+sb),
    # integer ceil], and its FIRST shared prefix gram always satisfies
    # the bound — so filtering per index hit before the distinct drops
    # only non-qualifying candidates. Integer arithmetic throughout.
    min_overlap = (
        (num * (F.col("sz_a") + F.col("sz_b")) + num + den - 1) / (num + den)
    ).cast("bigint")
    ubound = 1 + F.least(
        F.col("sz_a") - F.col("rnk_a"), F.col("sz_b") - F.col("rnk_b")
    )
    cand = (
        a.join(b, "gh")
        .filter(F.col("id_a") < F.col("id_b"))
        # J >= t implies min/max >= t: integer length filter
        .filter(
            (F.col("sz_a") * num <= F.col("sz_b") * den)
            & (F.col("sz_b") * num <= F.col("sz_a") * den)
        )
        .filter(ubound >= min_overlap)
        # sizes are functionally dependent on ids: carrying them through
        # the distinct and the verify aggregate deletes the two
        # post-aggregation size join-backs (round 13)
        .select("id_a", "id_b", "sz_a", "sz_b")
        .distinct()
    )
    # Verify stage: double posting-list join-back + count aggregate.
    # Round 14 measured and REJECTED the array alternative (collect the
    # gram set per doc once, then size(array_intersect) per candidate
    # pair — no fan-out exchange, no count aggregate): 4.0 → 4.9 s at
    # sf0.1 — the per-doc collect_list aggregate plus the per-pair
    # interpreted set-intersection cost more than the fan-out join they
    # replace, at this scale and at any scale where mean candidate
    # degree is low (the intersection still touches sz_a+sz_b elements
    # per pair, in slower per-element code than the join's hash
    # probes). Kept: the join-back shape, whose heaviest exchange is
    # bounded by candidate-degree × doc grams.
    ga = grams.select(F.col(id_col).alias("id_a"), "gh")
    gb = grams.select(F.col(id_col).alias("id_b"), "gh")
    inter = (
        cand.join(ga, "id_a")
        .join(gb, ["id_b", "gh"])
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
    )
    thr = threshold_num / threshold_den
    return (
        inter.select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= thr)
    )


# ---------------------------------------------------------------------------
# Duplicate clusters: connected components over a similarity pair graph
# ---------------------------------------------------------------------------

# Diagnostic: iterations the most recent connected_components() call
# took to converge (min-label floods one hop per round, so this reads
# the pair graph's effective diameter). Written by every call; scale
# probes read it to attribute superlinear wall growth to round count
# vs per-round cost (VERDICT r12 "What's wrong" #3 — q116's decade
# ratio).
LAST_CC_ITERATIONS: int = 0


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Connected components of the (undirected) duplicate-pair graph via
    iterative min-label propagation: ``(id, cluster_id)`` with
    ``cluster_id`` = the minimum doc id reachable from ``id``.

    Pair emitters (`ngram_jaccard_pairs`, LSH/MinHash candidates) give
    EDGES; production dedup needs the transitive closure — A~B and B~C
    must collapse to ONE surviving representative even when A~C was
    never emitted. Each iteration is one shuffle-join (edges ⨝ labels on
    the source id) plus one min-aggregate; with both edge directions
    present, the minimum label floods a component in at most its
    diameter — near-dup clusters are shallow (dozens of hops at the
    extreme), so convergence is a handful of iterations, never O(n).
    ``materialize`` truncates the growing lineage each round so the
    plan doesn't deepen exponentially (reliable ``checkpoint()`` when
    the session opts in with spark.iceberg_cache.reliableCheckpoint +
    a checkpoint dir — fault-tolerant on clusters; ``localCheckpoint``
    otherwise). The early-exit convergence probe is an
    aggregate (``limit(1).count()``), not a driver collect.

    ``pairs`` is materialized ONCE up front (``materialize``):
    upstream pair emitters are typically the most expensive plan in the
    job (inverted-index joins), and a lazy edge list would re-run that
    plan inside every iteration of the loop.

    Non-convergence is LOUD, never silent: min-label propagation moves
    a label one hop per iteration, so a component whose diameter
    exceeds ``max_iter`` (a >20-hop chain of near-dups — pathological
    but constructible) would otherwise return labels that are not the
    transitive closure, i.e. a silently wrong answer. If the loop
    exhausts ``max_iter`` while labels are still changing:
    ``on_nonconverged="raise"`` (default) raises RuntimeError telling
    the caller to raise ``max_iter``; ``"flag"`` returns the partial
    labels with a literal ``converged=false`` column so a pipeline can
    route them to a retry pass instead of dying mid-job.
    """
    if on_nonconverged not in ("raise", "flag"):
        raise ValueError(f"on_nonconverged must be 'raise' or 'flag', got {on_nonconverged!r}")
    global LAST_CC_ITERATIONS
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
    )
    edges = materialize(edges)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cid", F.col("id"))
    )
    converged = False
    for _it in range(max_iter):
        LAST_CC_ITERATIONS = _it + 1
        msgs = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "cid"
        )
        new = (
            labels.select("id", "cid")
            .unionByName(msgs)
            .groupBy("id")
            .agg(F.min("cid").alias("cid"))
        )
        # lazy checkpoint: the convergence probe below is the round's
        # ONE job — it computes the new labels AND persists their
        # blocks (plan truncation still happens immediately, keeping
        # per-round lineage flat). Same fusion as the star-CC loop.
        new = materialize(new, eager=False)
        changed = (
            new.join(labels.select("id", F.col("cid").alias("prev")), "id")
            .filter(F.col("cid") < F.col("prev"))
            .limit(1)
            .count()
        )
        # the probe was the last reader of the previous round's blocks
        # (round-0 labels derive from `edges`; root-only => no-op there).
        # successor=new: the release only happens if the probe really
        # did fill new's lazy checkpoint (guard, r7 advice)
        unmaterialize(labels, successor=new)
        labels = new
        if changed == 0:
            converged = True
            break
    if not converged:
        if on_nonconverged == "raise":
            raise RuntimeError(
                f"connected_components did not converge within max_iter={max_iter} "
                "iterations: a component's diameter exceeds the iteration budget and "
                "the returned labels would NOT be the transitive closure. "
                "Raise max_iter (each iteration floods labels one hop) or pass "
                "on_nonconverged='flag' to receive partial labels with converged=false."
            )
        return labels.withColumn("converged", F.lit(False))
    if on_nonconverged == "flag":
        return labels.withColumn("converged", F.lit(True))
    return labels


def incremental_dedup_flags(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Flag each BATCH doc that duplicates the EXISTING corpus — the
    daily-ingest shape of production dedup: the corpus is never
    self-joined or re-deduped, only the (small) new batch probes it.
    Returns ``(id, exact_dup, near_dup)`` per batch doc.

    - ``exact_dup``: an md5-identical text exists in the corpus
      (hash-key semi-join; at scale the corpus side is a pre-built
      fingerprint table and the probe is one broadcast/bucket join).
    - ``near_dup``: some corpus doc has n-gram Jaccard >= ``threshold``
      over the df-capped gram space (document frequency computed over
      corpus+batch so arriving batches see the same stop-gram set the
      corpus was filtered with). The inverted-index join is
      batch-grams x corpus-grams — O(|batch| * df) candidate work, never
      O(|corpus|²); this is why incremental dedup stays cheap as the
      corpus grows.
    """
    c_txt = corpus.select(F.col(id_col), F.col(text_col))
    b_txt = batch.select(F.col(id_col), F.col(text_col))
    exact = (
        b_txt.select(id_col, F.md5(F.col(text_col)).alias("_fp"))
        .join(
            c_txt.select(F.md5(F.col(text_col)).alias("_fp")).distinct(),
            "_fp",
            "left_semi",
        )
        .select(F.col(id_col).alias("_eid"))
        .distinct()
    )
    all_docs = c_txt.withColumn("_side", F.lit(0)).unionByName(
        b_txt.withColumn("_side", F.lit(1))
    )
    grams = (
        with_shingles(all_docs, text_col, n)
        .select(F.col(id_col), "_side", F.explode_outer(F.col("_sh")).alias("g"))
        .filter(F.col("g").isNotNull())
        .select(id_col, "_side", F.xxhash64("g").alias("gh"))
    )
    # Window counts instead of agg+join-backs, checkpoint moved to the
    # last shared frame — the ngram_jaccard_pairs round-13 treatment
    # (one exchange per count; identical values; NULL-id rows the old
    # inner join-back dropped die at the _bid/_cid join-backs below
    # either way).
    kept = (
        grams.withColumn("dfreq", F.count("*").over(W.partitionBy("gh")))
        .filter(F.col("dfreq") <= max_doc_freq)
        .select(id_col, "_side", "gh")
    )
    kept_sz = materialize(
        kept.withColumn(
            "sz", F.count("*").over(W.partitionBy(id_col, "_side"))
        ),
        eager=False,
    )
    bg = kept_sz.filter(F.col("_side") == 1).select(
        F.col(id_col).alias("_bid"), "gh", F.col("sz").alias("sz_b")
    )
    cg = kept_sz.filter(F.col("_side") == 0).select(
        F.col(id_col).alias("_cid"), "gh", F.col("sz").alias("sz_c")
    )
    pf = _prefilter_threshold(threshold)  # see ngram_jaccard_pairs
    near = (
        bg.join(cg, "gh")
        .filter(
            (F.col("sz_b") * pf <= F.col("sz_c"))
            & (F.col("sz_c") * pf <= F.col("sz_b"))
        )
        .groupBy("_bid", "_cid", "sz_b", "sz_c")
        .agg(F.count("*").alias("inter"))
        .filter(
            F.col("inter")
            / (F.col("sz_b") + F.col("sz_c") - F.col("inter")).cast("double")
            >= threshold
        )
        .select(F.col("_bid"))
        .distinct()
    )
    return (
        b_txt.select(id_col)
        .join(exact.withColumn("_e", F.lit(1)), F.col(id_col) == F.col("_eid"), "left")
        .join(near.withColumn("_n", F.lit(1)), F.col(id_col) == F.col("_bid"), "left")
        .select(
            id_col,
            F.coalesce(F.col("_e"), F.lit(0)).cast("int").alias("exact_dup"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("int").alias("near_dup"),
        )
    )


# --- star-CC local finish (optimization round 13) --------------------------
# Below this many edges the component computation leaves Spark: the edge
# list is pulled to the driver (Arrow path, ~16 bytes/edge) and labeled
# with an exact union-find — identical output to the distributed
# fixpoint, without paying ~6 shuffle-heavy rounds for a graph that fits
# in one broadcast-sized buffer. Same budget philosophy as a broadcast
# hash join (the driver already holds relations up to 8 GiB there); 1M
# edges is ~16 MB collected. The star loop also finishes locally as soon
# as a round's edge count (already computed by the convergence
# fingerprint) drops under the threshold — at 100 TB the first rounds
# shrink the edge set toward one edge per non-root node, so the tail
# rounds are exactly the overhead-dominated ones. Configurable per
# session; 0 disables (pure distributed loop, used by the equivalence
# tests as the reference).
CC_LOCAL_FINISH_CONF = "spark.iceberg_cache.cc.localFinishEdges"
CC_LOCAL_FINISH_DEFAULT = 1_000_000


def _cc_local_finish_threshold(spark) -> int:
    try:
        return int(spark.conf.get(CC_LOCAL_FINISH_CONF,
                                  str(CC_LOCAL_FINISH_DEFAULT)))
    except Exception:
        return CC_LOCAL_FINISH_DEFAULT


def _cc_labels_local(e: DataFrame) -> DataFrame:
    """Exact min-label components of the (bounded) edge set ``e`` via a
    driver-side union-find: ``(id, cid)`` with ``cid`` = min id in the
    component — the same contract as the distributed star fixpoint.
    Caller guarantees ``e.count()`` is under the local-finish threshold.

    Mid-loop use is sound because the star rounds preserve the node
    set and the component structure: every non-minimum node always
    carries an out-edge to a strictly smaller node (its neighborhood
    minimum), so no node of a >=2-component ever leaves the edge set,
    and rewiring through neighborhood minima preserves connectivity
    (Kiveris et al., SOCC'14) — the components (and their minima) of
    any round's edge set equal those of the input graph. Property-
    tested against the pure distributed loop in
    tests/test_round13_opt.py."""
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    spark = e.sparkSession
    pdf = e.select("u", "v").toPandas()
    both = pd.concat([pdf["u"], pdf["v"]], ignore_index=True)
    codes, uniques = pd.factorize(both)
    n = len(uniques)
    m = len(pdf)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    cu, cv = codes[:m], codes[m:]
    for i in range(m):
        ru, rv = find(cu[i]), find(cv[i])
        if ru != rv:
            parent[rv] = ru
    roots = [find(i) for i in range(n)]
    out = pd.DataFrame({"id": uniques, "root": roots})
    out["cid"] = out.groupby("root")["id"].transform("min")
    typ = e.schema["u"].dataType
    schema = StructType(
        [StructField("id", typ, True), StructField("cid", typ, True)]
    )
    return spark.createDataFrame(out[["id", "cid"]], schema=schema)


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SOCC'14 — public algorithm): ``(id, cid)`` with ``cid`` = min id in
    the component, identical output to :func:`connected_components`.

    Why a second algorithm: min-label propagation floods one hop per
    round, so a component's DIAMETER bounds the round count — fine for
    shallow near-dup clusters, pathological for chain-shaped graphs.
    Star contraction converges in O(log² n) rounds regardless of
    diameter (each round rewires whole neighborhoods onto local minima,
    roughly halving tree heights), making it the safe default for
    graphs whose shape is unknown at 100 TB. Per round: two
    neighborhood min-aggregates + joins, all on the id key; the edge
    set shrinks toward star graphs rooted at component minima.

    Convergence is detected by edge-set fixpoint (count + order-
    independent hash aggregate — no driver-side edge collection) and
    non-convergence raises, same contract as min-label.

    Per round the loop runs ONE job: the round's edge set is LAZILY
    checkpointed (``materialize(..., eager=False)`` — the logical plan
    is truncated immediately, which is mandatory here because each round
    references the previous edge set ~4×, so an untruncated plan grows
    exponentially) and the fingerprint aggregate both computes the round
    and persists its blocks. The round-5 shape paid a second job per
    round for the eager checkpoint write."""
    e = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = materialize(e)
    # one count over the freshly persisted blocks replaces the old
    # isEmpty probe AND gates the local finish (round 13): a bounded
    # edge set never enters the shuffle-per-round loop at all.
    n_edges = e.count()
    if n_edges == 0:
        return e.select(F.col("u").alias("id"), F.col("v").alias("cid"))
    local_thr = _cc_local_finish_threshold(e.sparkSession)
    if n_edges <= local_thr:
        labels = _cc_labels_local(e)
        unmaterialize(e)
        return labels

    def _fingerprint(edges: DataFrame) -> tuple:
        row = edges.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),  # no overflow, order-free
        ).collect()[0]
        return (row["n"], row["h"])

    def _nbrs(edges: DataFrame) -> DataFrame:
        return edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def _with_min(nbrs: DataFrame) -> DataFrame:
        m = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return nbrs.join(m, "u")

    prev = None
    for _ in range(max_iter):
        # large-star: hang every bigger neighbor off the local minimum
        nm = _with_min(_nbrs(e))
        large = (
            nm.filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: rewire the smaller-or-equal neighbors (and u) to it
        nm2 = _with_min(_nbrs(large))
        small = (
            nm2.filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(nm2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        new_e = materialize(small, eager=False)
        fp = _fingerprint(new_e)  # one job: computes new_e AND checkpoints it
        # superseded round; successor guard verifies new_e really is
        # self-contained before the release (r7 advice)
        unmaterialize(e, successor=new_e)
        e = new_e
        if fp == prev:
            break
        prev = fp
        # local finish (round 13): the fingerprint already carries the
        # round's edge count; once the contracting edge set fits the
        # driver budget, stop paying per-round shuffles — components
        # and minima of a round's edge set equal the input graph's
        # (see _cc_labels_local), so the labels are identical.
        if fp[0] <= local_thr:
            labels = _cc_labels_local(e)
            unmaterialize(e)
            return labels
    else:
        raise RuntimeError(
            f"connected_components_star did not reach an edge fixpoint in "
            f"max_iter={max_iter} rounds (O(log^2 n) expected); raise max_iter."
        )
    # fixpoint: star edges (child, root). Labels = children -> root,
    # roots -> themselves, plus any isolated-after-dedup self pairs.
    # The extraction ASSUMES the fixpoint is a forest of stars rooted at
    # component minima — verify that in the SAME grouped pass that
    # extracts the labels (a stable non-star fixpoint or a fingerprint
    # hash collision would otherwise return silently wrong labels, the
    # failure mode the min-label path guards against loudly).
    labels = _star_labels_checked(e)
    # the violation collect inside the checked pass has materialized the
    # grouped labels (checkpoint-backed, self-contained) — the final
    # round's edge blocks are no longer referenced; release them so a
    # long-lived session doesn't accumulate one edge-set per CC call
    # (r6 advice item 3, final-round leg).
    unmaterialize(e)
    return labels


def _star_labels_checked(e: DataFrame) -> DataFrame:
    """``(id, cid)`` labels from the star-forest fixpoint ``e``, with
    the forest contract asserted in the same pass — see
    :func:`_star_grouped_checked` for the mechanics."""
    return _star_grouped_checked(e).select("id", "cid")


def _star_grouped_checked(e: DataFrame) -> DataFrame:
    """One grouped pass over the fixpoint edge set ``e`` (u=child,
    v=parent) that yields ``(id, cid)`` labels AND raises unless ``e``
    is a forest of stars rooted at per-component minima:

    1. every edge points strictly downward (v < u) — roots are minima;
    2. every child has exactly one parent;
    3. no id is both a child and a parent (depth is exactly 1).

    Child rows carry ``_ic=1``, root rows ``_ic=0``; the single
    groupBy(id) then exposes every violation as a per-id flag
    (distinct-parent count, orientation, both-roles) and the label as
    ``min(cid)``. The grouped result is materialized once, so the
    violation scan is a tiny aggregate over the persisted labels and the
    caller's consumption does not recompute the union — cheaper than the
    round-5 shape (two dedicated assertion jobs + a fresh extraction
    scan), with the identical loud contract (round-5 verdict item 3)."""
    union = e.select(
        F.col("u").alias("id"), F.col("v").alias("cid"), F.lit(1).alias("_ic")
    ).unionByName(
        e.select(
            F.col("v").alias("id"), F.col("v").alias("cid"), F.lit(0).alias("_ic")
        )
    )
    grouped = materialize(  # lazy: the violation agg below computes it
        union.groupBy("id").agg(
            F.min("cid").alias("cid"),
            # e is kept distinct by the loop (and the entry filter), so
            # child-row count per id IS the distinct-parent count — a
            # plain sum avoids count_distinct's expand/two-phase agg.
            F.sum("_ic").alias("_np"),
            F.max(
                ((F.col("_ic") == 1) & (F.col("cid") >= F.col("id"))).cast("int")
            ).alias("_bad"),
            F.max("_ic").alias("_icmax"),
            F.min("_ic").alias("_icmin"),
        ),
        eager=False,
    )
    row = grouped.agg(
        F.max("_np").alias("max_parents"),
        F.max("_bad").alias("bad_orient"),
        F.max(
            ((F.col("_icmax") == 1) & (F.col("_icmin") == 0)).cast("int")
        ).alias("deep"),
    ).collect()[0]
    if (
        (row["max_parents"] or 0) > 1
        or (row["bad_orient"] or 0) > 0
        or (row["deep"] or 0) > 0
    ):
        raise RuntimeError(
            "connected_components_star reached an edge fixpoint that is NOT a "
            f"star forest (max_parents={row['max_parents']}, "
            f"bad_orientation={bool(row['bad_orient'])}, "
            f"depth>1={bool(row['deep'])}): "
            "labels would be wrong. This indicates a non-star stable fixpoint "
            "or a fingerprint collision — rerun with connected_components "
            "(min-label) or report the graph."
        )
    return grouped


def _assert_star_forest(e: DataFrame) -> None:
    """Raise unless edge set ``e`` (u=child, v=parent) is a star forest
    rooted at per-component minima — thin wrapper over the fused
    label-extraction pass (:func:`_star_grouped_checked`), kept as the
    standalone contract probe the shape tests exercise. Deduplicates
    first — the fused pass counts parents by row, relying on the CC
    loop's distinct edges. Assertion-only: the probe's materialized
    blocks are released before returning (r6 advice)."""
    unmaterialize(_star_grouped_checked(e.distinct()))


def boilerplate_gram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Per-document boilerplate exposure: of the doc's distinct word
    n-grams, how many occur in ≥ ``min_df`` documents (C4/RefinedWeb-
    style repeated-content signal, the precursor to span removal).

    Plan shape at 100 TB: one exploded-gram aggregate builds the
    document-frequency table (hash agg, map-side combine); the
    "boilerplate" gram set (df ≥ min_df) is a small fraction of the gram
    space by construction — high-df grams are few — so it BROADCASTS
    back, and the per-doc recount is a broadcast semi-join over the
    scan, not a second all-grams shuffle join."""
    grams = with_shingles(spread_scan(df, id_col), text_col, n).select(
        F.col(id_col), F.explode_outer(F.col("_sh")).alias("g")
    ).filter(F.col("g").isNotNull()).select(id_col, F.xxhash64("g").alias("gh"))
    boiler = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("dfreq"))
        .filter(F.col("dfreq") >= min_df)
        .select("gh")
    )
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = (
        grams.join(F.broadcast(boiler), "gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_boiler"))
    )
    return (
        sizes.join(hits, id_col, "left")
        .select(
            id_col,
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.coalesce(F.col("n_boiler"), F.lit(0))
            .cast("bigint")
            .alias("n_boiler"),
        )
    )
