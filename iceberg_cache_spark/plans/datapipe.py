"""Training-data pipeline tier, continued: passage-level exact dedup,
mergeable-sketch cardinality, and multi-column Z-order clustering.

These extend the curation tier (extensions.py q107–q119) with three
operations a 100 TB corpus pipeline needs that no earlier query covers:

- q145: RefinedWeb-style duplicated-passage removal, adapted to the
  synthetic single-line documents as fixed 10-word chunk dedup — keep a
  chunk only in the lowest-doc_id document that contains it, reassemble
  the surviving text. (The public technique is line-level exact dedup;
  the unit here is a token chunk because the synthetic corpus has no
  newlines.)
- q146: HyperLogLog sketch cardinality (pyspark's Datasketches-backed
  hll_sketch_agg) — the mergeable form of COUNT(DISTINCT): per-group
  sketches union into a global sketch WITHOUT rescanning, which is what
  makes per-shard/per-day cardinality rollups feasible at 100 TB.
  Estimates are engine-specific, so this is rows-only by design; the
  error bound and merge-consistency are pytest-asserted
  (tests/test_datapipe.py).
- q147: Z-order (Morton) clustering — interleave the bits of two
  bucketized columns so range predicates on EITHER column prune files.
  The query computes the exact integer z-values both engines agree on;
  the companion operator `operators.zorder.zorder_write` actually lays
  files out by z-range (plan- and pruning-tested).

ref parity: the reference has no passage dedup / sketches / clustering;
these are the scale-path additions SURVEY §2 calls for beyond ref ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from iceberg_cache_spark.plans.registry import declared
from iceberg_cache_spark.sources.testdata import load_table as T

CHUNK = 10  # words per dedup unit


@declared(
    "q145_chunk_dedup",
    f"""WITH toks AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       chunks AS (
         SELECT doc_id, CAST(i AS BIGINT) AS pos,
                array_to_string(w[(i*{CHUNK}+1):(i*{CHUNK}+{CHUNK})], ' ')
                  AS chunk
         FROM toks,
              UNNEST(range(CAST(ceil(len(w)/{CHUNK}.0) AS INT))) AS t(i)),
       firsts AS (
         SELECT chunk AS fchunk, MIN(doc_id) AS first_doc
         FROM chunks GROUP BY chunk)
       SELECT c.doc_id,
              CAST(COUNT(*) FILTER (WHERE f.first_doc = c.doc_id)
                   AS BIGINT) AS n_kept,
              CAST(COUNT(*) FILTER (WHERE f.first_doc < c.doc_id)
                   AS BIGINT) AS n_dropped,
              md5(COALESCE(string_agg(c.chunk, ' ' ORDER BY c.pos)
                    FILTER (WHERE f.first_doc = c.doc_id), ''))
                AS clean_md5
       FROM chunks c JOIN firsts f ON f.fchunk = c.chunk
       GROUP BY c.doc_id
       ORDER BY c.doc_id""",
)
def q145(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicated-passage removal (RefinedWeb line-dedup, chunk-unit):
    split each doc into 10-word chunks, keep a chunk only in the first
    (min doc_id) document containing it, emit per-doc kept/dropped
    counts and an md5 of the reassembled text.

    Scale shape: chunk→first-doc is a map-side-combinable hash
    aggregate JOINED back (not a window — no per-chunk sort), then one
    groupBy doc_id; two shuffles total, both on high-cardinality keys.
    At 100 TB the join key would be xxhash64(chunk) (8 bytes instead of
    the string; collisions only merge identical-hash chunks, same as
    every published line-dedup pipeline); the oracle keeps the exact
    string so the gate is collision-free."""
    d = T(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / CHUNK).cast("int")
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice(toks, i * CHUNK + 1, CHUNK), " "),
            )
        ).alias("pos", "chunk"),
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "chunk")
    firsts = chunks.groupBy(F.col("chunk").alias("fchunk")).agg(
        F.min("doc_id").alias("first_doc")
    )
    keep = F.col("first_doc") == F.col("doc_id")
    kept_struct = F.when(keep, F.struct("pos", "chunk"))
    return (
        chunks.join(firsts, F.col("fchunk") == F.col("chunk"))
        .groupBy("doc_id")
        .agg(
            F.count(F.when(keep, 1)).alias("n_kept"),
            F.count(F.when(~keep, 1)).alias("n_dropped"),
            F.md5(
                F.coalesce(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(kept_struct)),
                            lambda s: s.chunk,
                        ),
                        " ",
                    ),
                    F.lit(""),
                )
            ).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


@declared("q146_hll_cardinality")  # rows-only: sketch estimates are
# engine-specific (Datasketches HLL vs DuckDB's); error bound and
# merge-consistency asserted in tests/test_datapipe.py
def q146(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable distinct-count sketches: distinct users per event type
    via HLL sketch aggregate, plus an 'ALL' row produced by UNIONING
    the per-type sketches — no second scan. This is the 100 TB shape
    for cardinality rollups: per-partition/day/shard sketches persist
    as bytes and any slice union answers in O(sketch) time (exact
    COUNT DISTINCT would re-shuffle the raw keys per rollup level)."""
    e = T(spark, sf, "events")
    sk = e.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    per = sk.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    merged = sk.agg(F.hll_union_agg("sk").alias("u")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("u").alias("approx_users"),
    )
    return per.unionAll(merged).orderBy("event_type")


_ZBITS = 8  # bits per dimension -> 16-bit morton codes


def _interleave(a: F.Column, b: F.Column) -> F.Column:
    """Morton-interleave two _ZBITS-bit ints: a's bit k lands at 2k+1,
    b's at 2k. Pure integer expressions — whole-stage codegen, and
    bit-identical in any engine."""
    z = F.lit(0)
    for k in range(_ZBITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, k) % 2, 2 * k + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, k) % 2, 2 * k))
    return z


def _zsql(acol: str, bcol: str) -> str:
    terms = []
    for k in range(_ZBITS):
        terms.append(f"((({acol} >> {k}) % 2) << {2 * k + 1})")
        terms.append(f"((({bcol} >> {k}) % 2) << {2 * k})")
    return " | ".join(terms)


@declared(
    "q147_zorder_layout",
    f"""WITH bounds AS (
         SELECT MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax,
                MIN(l_extendedprice) AS pmin, MAX(l_extendedprice) AS pmax
         FROM lineitem),
       coded AS (
         SELECT CAST(FLOOR((l_quantity - qmin) * 255.0 / (qmax - qmin))
                     AS INT) AS qb,
                CAST(FLOOR((l_extendedprice - pmin) * 255.0
                           / (pmax - pmin)) AS INT) AS pb,
                l_quantity, l_extendedprice
         FROM lineitem, bounds)
       SELECT ({_zsql('qb', 'pb')}) >> 10 AS zbucket,
              CAST(COUNT(*) AS BIGINT) AS n,
              MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
              MIN(l_extendedprice) AS min_price,
              MAX(l_extendedprice) AS max_price
       FROM coded
       GROUP BY zbucket
       ORDER BY zbucket""",
)
def q147(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order layout statistics: bucketize (l_quantity,
    l_extendedprice) to 8 bits each from exact min/max bounds,
    Morton-interleave to a 16-bit z-value, and report per-z-range
    row counts and column min/max — the zone-map ranges a z-clustered
    file layout would expose. Every z-bucket bounds BOTH columns, which
    is the point of Z-order vs single-column sort. The bounds aggregate
    is a 1-row broadcast; the rest is scan-local integer math +
    one hash aggregate. `operators.zorder.zorder_write` applies the
    same code as a physical file layout."""
    li = T(spark, sf, "lineitem")
    b = li.agg(
        F.min("l_quantity").alias("qmin"),
        F.max("l_quantity").alias("qmax"),
        F.min("l_extendedprice").alias("pmin"),
        F.max("l_extendedprice").alias("pmax"),
    )
    qb = F.floor(
        (F.col("l_quantity") - F.col("qmin")) * 255.0 / (F.col("qmax") - F.col("qmin"))
    ).cast("int")
    pb = F.floor(
        (F.col("l_extendedprice") - F.col("pmin"))
        * 255.0
        / (F.col("pmax") - F.col("pmin"))
    ).cast("int")
    return (
        li.join(F.broadcast(b))
        .select(
            _interleave(qb, pb).alias("z"), "l_quantity", "l_extendedprice"
        )
        .groupBy(F.shiftright(F.col("z"), 10).alias("zbucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("zbucket")
    )


# ---------------------------------------------------------------------------
# Round 4: diameter-independent dedup clusters + incremental batch dedup
# ---------------------------------------------------------------------------

from iceberg_cache_spark.operators import dedup as _D  # noqa: E402
from iceberg_cache_spark.plans.extensions import _DUCK_TOKS  # noqa: E402
from iceberg_cache_spark.plans.registry import ORACLE  # noqa: E402


@declared(
    "q154_normalized_dedup",
    """WITH norm AS (
         SELECT doc_id,
                md5(trim(regexp_replace(lower(regexp_replace(text,
                    '[^A-Za-z0-9 ]', '', 'g')), ' +', ' ', 'g'))) AS fp
         FROM documents),
       reps AS (SELECT fp, MIN(doc_id) AS rep_id FROM norm GROUP BY fp)
       SELECT n.doc_id, r.rep_id,
              CAST(CASE WHEN n.doc_id = r.rep_id THEN 1 ELSE 0 END AS INT)
                AS keep
       FROM norm n JOIN reps r USING (fp)
       ORDER BY n.doc_id""",
)
def q154(spark: SparkSession, sf: str) -> DataFrame:
    """Normalization-insensitive exact dedup (the FineWeb/C4 preprocessing
    step BEFORE fingerprinting): strip non-alphanumerics, lowercase (the
    strip comes FIRST so lower() only sees ASCII — JVM vs utf8proc
    unicode tables diverge on edge codepoints, r11),
    collapse whitespace, then md5 → keep the min-doc_id representative
    per normalized fingerprint. Catches the case/punctuation/spacing
    variants plain md5 dedup (q60) misses. Plan: scan-local string
    normalization (whole-stage codegen) + one hash aggregate on the
    16-byte fingerprint + a fingerprint join-back — two shuffles on
    high-cardinality keys, no text ever shuffled twice."""
    d = T(spark, sf, "documents")
    fp = F.md5(
        F.trim(
            F.regexp_replace(
                F.lower(F.regexp_replace(F.col("text"), "[^A-Za-z0-9 ]", "")),
                " +",
                " ",
            )
        )
    )
    norm = d.select("doc_id", fp.alias("fp"))
    reps = norm.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    return (
        norm.join(reps, "fp")
        .select(
            "doc_id",
            "rep_id",
            F.when(F.col("doc_id") == F.col("rep_id"), 1)
            .otherwise(0)
            .cast("int")
            .alias("keep"),
        )
        .orderBy("doc_id")
    )


@declared("q148_dedup_clusters_star", ORACLE["q116_dedup_clusters"])
def q148(spark: SparkSession, sf: str) -> DataFrame:
    """Same declared result as q116 (duplicate clusters of the exact
    n-gram-Jaccard >= 0.5 pair graph; oracle = the identical recursive
    CTE) computed with the diameter-independent algorithm: alternating
    large-star/small-star contraction (Kiveris et al. SOCC'14) instead
    of min-label propagation. O(log^2 n) rounds regardless of component
    shape — the safe default when cluster diameter is unknown at
    100 TB. Hash-equality with q116's oracle is the cross-algorithm
    correctness proof. The labels come from the session's derived-
    intermediate cache (plans/shared.py): the first of q148/q150/q158
    to run pays the pair-graph + CC cost, the rest are cache hits."""
    from iceberg_cache_spark.plans.shared import ngram_cc_labels

    return (
        ngram_cc_labels(spark, sf)
        .select(
            F.col("id").alias("doc_id"),
            F.col("cid").cast("bigint").alias("cluster_id"),
        )
        .orderBy("doc_id")
    )


@declared(
    "q149_incremental_dedup",
    f"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
       batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
       exact AS (
         SELECT DISTINCT b.doc_id FROM batch b
         JOIN corpus c ON md5(b.text) = md5(c.text)),
       toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       allgrams AS (
         SELECT DISTINCT doc_id, g FROM (
           SELECT doc_id,
                  array_to_string(t[CAST(i+1 AS BIGINT):CAST(i+3 AS BIGINT)], ' ') AS g
           FROM toks, UNNEST(range(greatest(len(t) - 2, 1))) AS u(i))),
       gram_df AS (SELECT g, COUNT(*) AS dfreq FROM allgrams GROUP BY g),
       grams AS (SELECT doc_id, g FROM allgrams JOIN gram_df USING (g)
                 WHERE dfreq <= 100),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
       inter AS (
         SELECT bg.doc_id AS bid, cg.doc_id AS cid, COUNT(*) AS i
         FROM grams bg JOIN grams cg USING (g)
         WHERE bg.doc_id % 5 = 0 AND cg.doc_id % 5 <> 0
         GROUP BY bg.doc_id, cg.doc_id),
       near AS (
         SELECT DISTINCT bid FROM inter
         JOIN sizes sb ON sb.doc_id = bid
         JOIN sizes sc ON sc.doc_id = cid
         WHERE i / CAST(sb.sz + sc.sz - i AS DOUBLE) >= 0.5)
       SELECT b.doc_id,
              CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
                AS exact_dup,
              CAST(CASE WHEN n.bid IS NOT NULL THEN 1 ELSE 0 END AS INT)
                AS near_dup
       FROM batch b
       LEFT JOIN exact e ON e.doc_id = b.doc_id
       LEFT JOIN near n ON n.bid = b.doc_id
       ORDER BY b.doc_id""",
)
def q149(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental (batch-vs-corpus) dedup — the daily-ingest shape: a
    new batch (doc_id % 5 = 0) probes the existing corpus (the rest)
    for exact (md5 fingerprint semi-join) and near (df-capped n-gram
    Jaccard >= 0.5, inverted-index join restricted to batch x corpus
    pairs) duplicates. The corpus is NEVER self-joined — candidate work
    is O(|batch| * df), so ingest cost stays flat as the corpus grows.
    """
    d = T(spark, sf, "documents")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    return _D.incremental_dedup_flags(corpus, batch).orderBy("doc_id")


@declared(
    "q150_dedup_apply",
    f"""WITH RECURSIVE toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       allgrams AS (
         SELECT DISTINCT doc_id, g FROM (
           SELECT doc_id,
                  array_to_string(t[CAST(i+1 AS BIGINT):CAST(i+3 AS BIGINT)], ' ') AS g
           FROM toks, UNNEST(range(greatest(len(t) - 2, 1))) AS u(i))),
       gram_df AS (SELECT g, COUNT(*) AS dfreq FROM allgrams GROUP BY g),
       grams AS (SELECT doc_id, g FROM allgrams JOIN gram_df USING (g)
                 WHERE dfreq <= 100),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
         FROM grams a JOIN grams b USING (g)
         WHERE a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id),
       pairs AS (
         SELECT id_a, id_b FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5),
       edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION ALL SELECT id_b, id_a FROM pairs),
       reach(doc, r) AS (
         SELECT DISTINCT a, a FROM edges
         UNION
         SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.doc),
       clusters AS (SELECT doc, MIN(r) AS cid FROM reach GROUP BY doc),
       dropped AS (SELECT doc FROM clusters WHERE doc <> cid)
       SELECT d.lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(COUNT(*) FILTER (dr.doc IS NULL) AS BIGINT) AS n_kept,
              CAST(COUNT(*) FILTER (dr.doc IS NOT NULL) AS BIGINT) AS n_dropped,
              CAST(COALESCE(SUM(d.n_chars) FILTER (dr.doc IS NULL), 0) AS BIGINT)
                AS kept_chars
       FROM documents d LEFT JOIN dropped dr ON dr.doc = d.doc_id
       GROUP BY d.lang ORDER BY d.lang""",
)
def q150(spark: SparkSession, sf: str) -> DataFrame:
    """The dedup KILL path end-to-end: near-dup clusters (exact n-gram
    Jaccard >= 0.5, connected components) -> keep the min-doc_id
    representative per cluster -> drop the rest -> per-language corpus
    reduction report. This is the query a pipeline actually ships:
    q62-q74/q116 find duplicates; this one applies the decision and
    accounts for what survived. One anti-join against the (small)
    dropped-id set over the scan — the corpus is never rescanned per
    cluster. Cluster labels ride the session's derived-intermediate
    cache (plans/shared.py), shared with q148/q158."""
    from iceberg_cache_spark.plans.shared import ngram_cc_labels

    d = T(spark, sf, "documents")
    clusters = ngram_cc_labels(spark, sf)
    dropped = clusters.filter(F.col("id") != F.col("cid")).select(
        F.col("id").alias("doc_id")
    )
    flagged = d.join(
        dropped.withColumn("_drop", F.lit(1)), "doc_id", "left"
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("_drop").isNull(), 1)).cast("bigint").alias("n_kept"),
            F.count(F.when(F.col("_drop").isNotNull(), 1)).cast("bigint").alias("n_dropped"),
            F.coalesce(
                F.sum(F.when(F.col("_drop").isNull(), F.col("n_chars"))), F.lit(0)
            ).cast("bigint").alias("kept_chars"),
        )
        .orderBy("lang")
    )


_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""SELECT '{c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               ROUND(CAST(COUNT(*) - COUNT({c}) AS DOUBLE)
                     / COUNT(*), 6) AS null_frac
        FROM events"""
    for c in _EVENT_COLS
)


@declared("q157_null_profile", f"SELECT * FROM ({_PROFILE_ORACLE}) ORDER BY col")
def q157(spark: SparkSession, sf: str) -> DataFrame:
    """Per-column completeness profile — the schema-quality audit every
    ingestion pipeline runs before trusting a 100 TB drop: for each
    column, row count, NULL count, and NULL fraction.

    Plan shape is the point: ONE scan and ONE partial-aggregating
    hash aggregate compute every column's counters simultaneously
    (count(col) skips NULLs in both engines), producing a single wide
    row that a driver-side-free explode pivots to long form — versus
    the oracle's (and the naive) one-scan-per-column formulation,
    which is O(columns) passes over the corpus."""
    ev = T(spark, sf, "events")
    n = F.count("*")
    wide = ev.agg(
        n.alias("_n"),
        *[F.count(F.col(c)).alias(f"_c_{c}") for c in _EVENT_COLS],
    )
    cols = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("_n").cast("bigint").alias("n_rows"),
                (F.col("_n") - F.col(f"_c_{c}")).cast("bigint").alias("n_null"),
                # try_divide: NULL on an empty table, matching DuckDB's
                # NULL division-by-zero (ANSI Spark would raise) —
                # empty-input gate, r6
                F.round(
                    F.try_divide(
                        (F.col("_n") - F.col(f"_c_{c}")).cast("double"),
                        F.col("_n"),
                    ),
                    6,
                ).alias("null_frac"),
            )
            for c in _EVENT_COLS
        ]
    )
    return (
        wide.select(F.explode(cols).alias("p"))
        .select("p.col", "p.n_rows", "p.n_null", "p.null_frac")
        .orderBy("col")
    )


from iceberg_cache_spark.plans.extensions import CC_LABELS_CTE as _CC_CTE  # noqa: E402


@declared(
    "q158_cluster_size_histogram",
    _CC_CTE
    + """,
       csize AS (SELECT cluster_id, COUNT(*) AS cs FROM labels
                 GROUP BY cluster_id)
       SELECT CAST(cs AS BIGINT) AS cluster_size,
              CAST(COUNT(*) AS BIGINT) AS n_clusters,
              CAST(cs * COUNT(*) AS BIGINT) AS n_docs
       FROM csize GROUP BY cs ORDER BY cluster_size""",
)
def q158(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup observability: the duplicate-cluster SIZE DISTRIBUTION of
    the exact n-gram-Jaccard >= 0.5 graph — how many clusters of 2, of
    3, ... and how many documents each bucket holds. This is the
    report a curation run publishes to justify its kill rate (and the
    early-warning signal for a degenerate similarity threshold: a
    giant component shows up as one huge cluster_size row). Shares the
    q116/q148 oracle's CC prefix; the Spark side rides the
    diameter-independent star contraction, then two id-keyed
    aggregates — nothing rescans the corpus, and the labels come from
    the session's derived-intermediate cache (plans/shared.py): after
    q148/q150 this query costs the hit path (VERDICT r6 item 5)."""
    from iceberg_cache_spark.plans.shared import ngram_cc_labels

    labels = ngram_cc_labels(spark, sf)
    return (
        labels.groupBy("cid")
        .agg(F.count("*").alias("cs"))
        .groupBy("cs")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
        .select(
            F.col("cs").cast("bigint").alias("cluster_size"),
            "n_clusters",
            (F.col("cs") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


from iceberg_cache_spark.operators.text import tokens as _text_tokens  # noqa: E402

SPAN_K = 5  # tokens per span
SPAN_MIN_DF = 2  # repeated = seen in >= 2 distinct documents
SPAN_TOP = 200


@declared(
    "q159_repeated_spans",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       spans AS (
         SELECT doc_id,
                array_to_string(t[CAST(i+1 AS BIGINT):CAST(i+{SPAN_K} AS BIGINT)],
                                ' ') AS span
         FROM toks,
              UNNEST(range(greatest(len(t) - {SPAN_K - 1}, 1))) AS u(i)),
       f AS (SELECT doc_id, span FROM spans WHERE span <> ''),
       reg AS (
         SELECT span,
                CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                CAST(COUNT(*) AS BIGINT) AS n_occ
         FROM f GROUP BY span
         HAVING COUNT(DISTINCT doc_id) >= {SPAN_MIN_DF})
       SELECT span, n_docs, n_occ FROM reg
       ORDER BY n_docs DESC, n_occ DESC, span LIMIT {SPAN_TOP}""",
)
def q159(spark: SparkSession, sf: str) -> DataFrame:
    """Repeated-span registry: the top cross-document {K}-token spans —
    the excision candidate list a substring-dedup pass (C4/RefinedWeb
    style, Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better") consumes. q118's per-doc boilerplate EXPOSURE says
    how contaminated each document is; this query produces the REGISTRY
    of offending spans themselves (span, distinct-doc count, total
    occurrences), deterministic top-{TOP} by reach.

    Plan shape at 100 TB: one exploded-span hash aggregate (map-side
    combine on the span key) and a TakeOrdered top-k — never a global
    sort. Count-distinct over doc_id rides Spark's two-phase partial
    aggregation. At petabyte scale the group key would be the span's
    64-bit fingerprint (xxhash64) rather than the text — same plan,
    ~10x narrower shuffle rows — with text recovered by a second join
    against one representative occurrence; the declared query groups by
    text so the DuckDB oracle is engine-portable. Sub-{K}-token
    documents contribute their whole text as one short span (both
    engines index max(n-{K}+1, 1) spans); empty/NULL texts contribute
    nothing (the span <> '' gate fails on '' and on NULL)."""
    d = T(spark, sf, "documents")
    toks = d.select("doc_id", _text_tokens(F.col("text")).alias("t"))
    idx = F.sequence(
        F.lit(0), F.greatest(F.size(F.col("t")) - SPAN_K, F.lit(0))
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx, lambda i: F.array_join(F.slice(F.col("t"), i + 1, SPAN_K), " ")
            )
        ).alias("span"),
    ).filter(F.col("span") != "")
    return (
        spans.groupBy("span")
        .agg(
            F.count_distinct(F.col("doc_id")).cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= SPAN_MIN_DF)
        .orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), "span")
        .limit(SPAN_TOP)
    )


q159.__doc__ = q159.__doc__.replace("{K}", str(SPAN_K)).replace(
    "{TOP}", str(SPAN_TOP)
)

SAMPLE_K = 100  # weighted sample size
_U_DENOM = float(16 ** 15)  # 60-bit md5 prefix -> uniform in (0,1)


@declared(
    "q160_weighted_sample",
    f"""WITH w AS (
         SELECT doc_id, GREATEST(n_chars, 1) AS wt,
                (('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT + 0.5)
                  / {_U_DENOM!r} AS u
         FROM documents),
       keyed AS (
         SELECT doc_id, CAST(wt AS BIGINT) AS wt,
                ROUND(-ln(u) / wt, 9) AS es_key
         FROM w)
       SELECT doc_id, wt, es_key FROM keyed
       ORDER BY es_key, doc_id LIMIT {SAMPLE_K}""",
)
def q160(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic weighted sampling without replacement — the data-
    selection primitive that picks documents proportionally to a
    quality/length weight (here n_chars) for a training mix. Algorithm
    A-ES (Efraimidis & Spirakis 2006): each item draws uniform u and
    gets key u^(1/w); the k largest keys are the sample, equivalently
    the k SMALLEST of -ln(u)/w (the exponential-race form used here).

    Reproducibility is the whole point: u derives from a portable
    md5-prefix hash of doc_id (the q88 pattern — both engines convert
    the same 60-bit integer, so the doubles are bit-identical), not an
    RNG, so the sample is stable across engines, runs, and cluster
    sizes. The key is ROUNDED to 9 decimals before ranking (the q155
    discipline) so rank order can't hinge on sub-ulp ln() differences,
    with doc_id as the total-order tiebreak.

    Plan shape at 100 TB: scan -> per-row expressions -> TakeOrdered
    top-k. No shuffle except the k-row final ordering; never a global
    sort."""
    d = T(spark, sf, "documents")
    wt = F.greatest(F.col("n_chars"), F.lit(1))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(_U_DENOM)
    keyed = d.select(
        "doc_id",
        wt.cast("bigint").alias("wt"),
        F.round(-F.log(u) / wt, 9).alias("es_key"),
    )
    return keyed.orderBy("es_key", "doc_id").limit(SAMPLE_K)


MIX_BUDGET = 200  # total docs in the mixture sample
_W_SCALE = 1_000_000  # sqrt weights fixed-point scaled to exact integers
# Fan-out for q161's salted two-phase per-source top-k. Phase 1 ranks
# within (source, salt) so a 100 TB single-source corpus still spreads
# over SALT_BUCKETS tasks; survivors are <= SALT_BUCKETS * MIX_BUDGET
# rows per source, so the exact phase-2 rank is O(1)-sized regardless
# of corpus scale. Sized to the local core count; on a real cluster
# raise it toward executor-core count.
SALT_BUCKETS = 32


@declared(
    "q161_mixture_sample",
    f"""WITH counts AS (
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
         FROM documents GROUP BY source),
       w AS (SELECT source, n_s,
                    CAST(ROUND(sqrt(n_s) * {_W_SCALE}, 0) AS BIGINT) AS ws
             FROM counts),
       tot AS (SELECT SUM(ws) AS tw FROM w),
       tgt AS (SELECT source, n_s,
                      CAST(({MIX_BUDGET} * ws) // tw AS BIGINT) AS target
               FROM w CROSS JOIN tot),
       ranked AS (
         SELECT d.doc_id, d.source,
                CAST(ROW_NUMBER() OVER (
                  PARTITION BY d.source
                  ORDER BY md5(d.doc_id::VARCHAR), d.doc_id) AS BIGINT) AS rnk
         FROM documents d)
       SELECT r.source, r.doc_id, r.rnk, t.target
       FROM ranked r JOIN tgt t USING (source)
       WHERE r.rnk <= t.target
       ORDER BY r.source, r.rnk""",
)
def q161(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled mixture sampling — the data-mixing step that
    keeps a multi-source corpus from being dominated by its largest
    source (the alpha=0.5 temperature of multilingual/UniMax-style
    mixing): per-source budget proportional to sqrt(n_source), then a
    deterministic per-source draw.

    Every arithmetic step is engine-exact by construction: sqrt is
    IEEE-correctly-rounded (bit-identical in any engine, unlike pow),
    weights become fixed-point BIGINTs, the budget split is pure
    integer floor division, and the draw orders by a portable
    md5-of-id hash — so the SAME sample comes out of Spark, DuckDB, or
    a 1000-executor cluster.

    Plan shape at 100 TB — salted two-phase top-k, NOT a per-source
    window over the corpus (source is low-cardinality: one window
    partition per source routes the whole corpus through a handful of
    tasks). Phase 1 ranks within (source, salt-of-doc_id) — every true
    top-``target`` row has global rank <= target, hence per-salt rank
    <= target, so filtering per-salt rank keeps a superset. Phase 2
    re-ranks the survivors (<= SALT_BUCKETS * target rows per source —
    constant-bounded, independent of corpus size) for the exact global
    rank. Heavy shuffle is salted; the exact pass is O(sources * k)."""
    d = T(spark, sf, "documents")
    counts = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n_s"))
    w = counts.withColumn(
        "ws", F.round(F.sqrt(F.col("n_s")) * _W_SCALE, 0).cast("bigint")
    )
    tot = w.agg(F.sum("ws").alias("tw"))
    tgt = w.join(F.broadcast(tot)).select(
        "source",
        F.expr(f"CAST(({MIX_BUDGET} * ws) DIV tw AS BIGINT)").alias("target"),
    )
    hk = F.md5(F.col("doc_id").cast("string"))
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(SALT_BUCKETS))
    local_w = W.partitionBy("source", "_salt").orderBy("_hk", "doc_id")
    cand = (
        d.select("doc_id", "source", hk.alias("_hk"), salt.alias("_salt"))
        .withColumn("_lrnk", F.row_number().over(local_w))
        .join(F.broadcast(tgt), "source")
        .filter(F.col("_lrnk") <= F.col("target"))
    )
    exact_w = W.partitionBy("source").orderBy("_hk", "doc_id")
    return (
        cand.withColumn("rnk", F.row_number().over(exact_w).cast("bigint"))
        .filter(F.col("rnk") <= F.col("target"))
        .select("source", "doc_id", "rnk", "target")
        .orderBy("source", "rnk")
    )


CLIP_LO = 0.05
CLIP_HI = 0.95


@declared(
    "q162_percentile_clip",
    f"""WITH ranked AS (
         SELECT lang, doc_id, n_chars,
                ROW_NUMBER() OVER w AS rn,
                COUNT(*) OVER (PARTITION BY lang) AS n
         FROM documents
         WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)),
       bounds AS (
         SELECT lang,
                MIN(CASE WHEN rn = GREATEST(CAST(ceil({CLIP_LO} * n) AS BIGINT), 1)
                         THEN n_chars END) AS lo,
                MIN(CASE WHEN rn = GREATEST(CAST(ceil({CLIP_HI} * n) AS BIGINT), 1)
                         THEN n_chars END) AS hi
         FROM ranked GROUP BY lang)
       SELECT d.lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              b.lo, b.hi,
              CAST(COUNT(*) FILTER (d.n_chars < b.lo) AS BIGINT) AS n_below,
              CAST(COUNT(*) FILTER (d.n_chars > b.hi) AS BIGINT) AS n_above,
              CAST(COUNT(*) FILTER (d.n_chars BETWEEN b.lo AND b.hi)
                   AS BIGINT) AS n_kept
       FROM documents d JOIN bounds b
         ON b.lang IS NOT DISTINCT FROM d.lang
       GROUP BY d.lang, b.lo, b.hi ORDER BY d.lang""",
)
def q162(spark: SparkSession, sf: str) -> DataFrame:
    """Percentile-clipped outlier filtering — the winsorizing pass that
    drops per-language length outliers (too-short fragments, too-long
    concatenation artifacts) before training. Bounds are DISCRETE
    quantiles (the value at row ceil(p*n) of the (n_chars, doc_id)
    order), computed with a window rank rather than an interpolating
    percentile aggregate: discrete selection is integer-exact and
    engine-portable, where interpolation formulas can differ in their
    last ulp. Both engines evaluate the identical ceil(p*n) double
    expression, so even the float boundary lands identically.

    Plan shape at 100 TB: the discrete rank-idx value depends only on
    per-(lang, n_chars) COUNTS, so the bounds come from a map-side-
    combinable hash aggregate + a cumulative sum over DISTINCT length
    values (bounded by the value domain, not the row count) — never a
    per-row window partitioned by low-cardinality lang (which would
    route the whole corpus through one task per language). The value
    at rank idx in (n_chars ASC NULLS LAST, doc_id) order is the
    smallest n_chars whose running count reaches idx — the doc_id
    tiebreak can only permute rows WITHIN an equal-n_chars run, never
    change the value at the rank. The per-doc clip test is a broadcast
    join + filter, never a second shuffle. NULL lang is its own group
    (null-safe join); NULL n_chars sorts last on both engines by
    construction, so a boundary landing in the NULL run yields NULL
    bounds identically."""
    d = T(spark, sf, "documents")
    counts = d.groupBy("lang", "n_chars").agg(F.count("*").alias("c"))
    w_cum = (
        W.partitionBy("lang")
        .orderBy(F.col("n_chars").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = counts.select(
        "lang",
        "n_chars",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(W.partitionBy("lang")).alias("n"),
    )
    def at(p):
        idx = F.greatest(F.ceil(F.lit(p) * F.col("n")).cast("bigint"), F.lit(1))
        return F.min(F.when(F.col("cum") >= idx, F.col("n_chars")))
    bounds = cum.groupBy("lang").agg(
        at(CLIP_LO).alias("lo"), at(CLIP_HI).alias("hi")
    )
    joined = d.join(
        F.broadcast(bounds.withColumnRenamed("lang", "_blang")),
        F.col("lang").eqNullSafe(F.col("_blang")),
    )
    return (
        joined.groupBy("lang", "lo", "hi")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("n_chars") < F.col("lo"), 1))
            .cast("bigint")
            .alias("n_below"),
            F.count(F.when(F.col("n_chars") > F.col("hi"), 1))
            .cast("bigint")
            .alias("n_above"),
            F.count(
                F.when(
                    (F.col("n_chars") >= F.col("lo"))
                    & (F.col("n_chars") <= F.col("hi")),
                    1,
                )
            )
            .cast("bigint")
            .alias("n_kept"),
        )
        .select("lang", "n_docs", "lo", "hi", "n_below", "n_above", "n_kept")
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q163–q165: corpus-statistics quality tier — unigram LM scoring,
# PMI collocations, and per-document vocabulary novelty. All three are
# pure hash-aggregate/join pipelines over the exploded token stream
# (no corpus-wide low-cardinality windows, no Python in the hot path);
# float determinism follows the q155 precedent: ln() lands on a 1e-6
# fixed-point grid (ROUND then BIGINT) before any aggregation or
# ranking, so cross-engine sub-ulp libm drift cannot reorder results.
# ref parity: the reference has no corpus-statistics tier; these are
# training-pipeline additions per the build brief (CCNet-style LM
# quality filtering, collocation mining, vocabulary-growth telemetry).
# ---------------------------------------------------------------------------

LM_THRESH_E6 = -3_700_000  # keep docs with mean token ln-prob >= -3.7


@declared(
    "q163_unigram_logprob",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
       freq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS f FROM tok GROUP BY tok),
       n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok),
       term AS (
         SELECT doc_id,
                CAST(ROUND(ln(f / n) * 1000000) AS BIGINT) AS lp_e6
         FROM tok JOIN freq USING (tok) CROSS JOIN n)
       SELECT doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_toks,
              CAST(SUM(lp_e6) AS BIGINT) AS sum_logprob_e6,
              SUM(lp_e6) >= COUNT(*) * {LM_THRESH_E6} AS kept
       FROM term GROUP BY doc_id ORDER BY doc_id""",
)
def q163(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram language-model scoring (CCNet-style quality filter):
    score each document by the sum of ln p(token) under the corpus's
    own unigram distribution and keep documents whose MEAN token
    log-probability clears a threshold — the cheap first-pass proxy
    for "looks like natural language" that LM-perplexity filtering
    refines. ln lands on a 1e-6 fixed-point grid per TERM (BIGINT),
    so the per-doc SUM is exact integer arithmetic — order-independent
    on any partitioning — and the keep test is the integer comparison
    sum >= n * thresh (no float division anywhere).

    Plan shape at 100 TB: one exploded-token scan feeds a map-side-
    combinable vocabulary aggregate; scoring joins the stream back to
    the vocabulary on the high-cardinality token key; the 1-row corpus
    total broadcasts; the per-doc rollup shuffles on doc_id. No
    windows, no skew pivots."""
    d = T(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(_text_tokens(F.col("text"))).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").cast("double").alias("f"))
    n = tok.agg(F.count("*").cast("double").alias("n"))
    term = (
        tok.join(freq, "tok")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            F.round(F.log(F.col("f") / F.col("n")) * 1_000_000)
            .cast("bigint")
            .alias("lp_e6"),
        )
    )
    return (
        term.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_toks"),
            F.sum("lp_e6").cast("bigint").alias("sum_logprob_e6"),
        )
        .select(
            "doc_id",
            "n_toks",
            "sum_logprob_e6",
            (
                F.col("sum_logprob_e6")
                >= F.col("n_toks") * F.lit(LM_THRESH_E6)
            ).alias("kept"),
        )
        .orderBy("doc_id")
    )


PMI_MIN_COUNT = 5  # bigram support floor
PMI_TOP = 30


@declared(
    "q164_pmi_collocations",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents
         ),
       big AS (
         SELECT unnest(list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i + 1])) AS bg
         FROM toks WHERE len(t) >= 2),
       bc AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c_ab
              FROM big GROUP BY bg),
       tok AS (SELECT unnest(t) AS tok FROM toks),
       uc AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY tok),
       tot AS (SELECT CAST((SELECT COUNT(*) FROM big) AS DOUBLE) AS b,
                      CAST((SELECT COUNT(*) FROM tok) AS DOUBLE) AS u),
       scored AS (
         SELECT string_split(bg, ' ')[1] AS w1,
                string_split(bg, ' ')[2] AS w2,
                c_ab,
                CAST(ROUND(ln((c_ab / b) / ((ca.c / u) * (cb.c / u)))
                           * 1000000) AS BIGINT) AS pmi_e6
         FROM bc CROSS JOIN tot
         JOIN uc ca ON ca.tok = string_split(bg, ' ')[1]
         JOIN uc cb ON cb.tok = string_split(bg, ' ')[2]
         WHERE c_ab >= {PMI_MIN_COUNT})
       SELECT w1, w2, c_ab, pmi_e6 FROM scored
       ORDER BY pmi_e6 DESC, w1, w2 LIMIT {PMI_TOP}""",
)
def q164(spark: SparkSession, sf: str) -> DataFrame:
    """PMI collocation mining: the top adjacent word pairs by pointwise
    mutual information ln( p(ab) / (p(a) p(b)) ) with a support floor —
    the classic phrase-discovery pass (word2vec-phrases, NPMI corpus
    analysis) a tokenizer-training pipeline runs before merging multi-
    word units. PMI lands on the 1e-6 fixed-point grid BEFORE ranking
    (ties then break on the words), so cross-engine ln drift cannot
    permute the leaderboard.

    Plan shape at 100 TB: bigrams come from an array transform inside
    the token scan (no self-join on position); counts are map-side-
    combinable hash aggregates on high-cardinality keys; the two
    unigram lookups are token-keyed shuffles; the 1-row totals
    broadcast; the final top-30 is a TakeOrdered, never a full sort."""
    d = T(spark, sf, "documents")
    toks = d.select(_text_tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    big = toks.select(
        F.explode(
            F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))")
        ).alias("bg")
    )
    bc = big.groupBy("bg").agg(F.count("*").cast("bigint").alias("c_ab"))
    tok = d.select(F.explode(_text_tokens(F.col("text"))).alias("tok"))
    uc = tok.groupBy("tok").agg(F.count("*").cast("double").alias("c"))
    tot = big.agg(F.count("*").cast("double").alias("b")).join(
        tok.agg(F.count("*").cast("double").alias("u"))
    )
    split = F.split(F.col("bg"), " ")
    scored = (
        bc.filter(F.col("c_ab") >= PMI_MIN_COUNT)
        .select(
            split.getItem(0).alias("w1"),
            split.getItem(1).alias("w2"),
            "c_ab",
        )
        .join(F.broadcast(tot))
        .join(uc.withColumnRenamed("tok", "w1").withColumnRenamed("c", "ca"), "w1")
        .join(uc.withColumnRenamed("tok", "w2").withColumnRenamed("c", "cb"), "w2")
        .select(
            "w1",
            "w2",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("b"))
                    / ((F.col("ca") / F.col("u")) * (F.col("cb") / F.col("u")))
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("pmi_e6"),
        )
    )
    return scored.orderBy(F.col("pmi_e6").desc(), "w1", "w2").limit(PMI_TOP)


@declared(
    "q165_token_novelty",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       dt AS (SELECT DISTINCT doc_id, unnest(t) AS tok FROM toks),
       first_seen AS (SELECT tok, MIN(doc_id) AS first_doc FROM dt GROUP BY tok)
       SELECT doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_terms,
              CAST(COUNT(*) FILTER (first_doc = doc_id) AS BIGINT) AS n_novel,
              CAST((COUNT(*) FILTER (first_doc = doc_id)) * 1000000
                   // COUNT(*) AS BIGINT) AS novelty_e6
       FROM dt JOIN first_seen USING (tok)
       GROUP BY doc_id ORDER BY doc_id""",
)
def q165(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document vocabulary novelty: the fraction of a document's
    DISTINCT terms that first appear (in doc_id order) in that
    document — the vocabulary-growth telemetry a curation pipeline
    tracks to see when additional data stops contributing new types
    (Heaps-law saturation) and to rank documents for coverage-greedy
    selection. Pure integer arithmetic end-to-end: counts, a MIN
    aggregate, and a fixed-point floor division (both engines floor
    non-negative integer division identically).

    Plan shape at 100 TB: distinct (doc, term) pairs via hash
    aggregate, the first-seen table is a token-keyed MIN aggregate
    joined back on the same high-cardinality key, then a doc-keyed
    rollup — three shuffles, all on high-cardinality keys, no windows."""
    d = T(spark, sf, "documents")
    dt = d.select(
        "doc_id", F.explode(_text_tokens(F.col("text"))).alias("tok")
    ).distinct()
    first_seen = dt.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    novel = F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
    return (
        dt.join(first_seen, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            novel.cast("bigint").alias("n_novel"),
            F.expr(
                "CAST(count(CASE WHEN first_doc = doc_id THEN 1 END) * 1000000"
                " DIV count(*) AS BIGINT)"
            ).alias("novelty_e6"),
        )
        .orderBy("doc_id")
    )


def _span_base(d: DataFrame) -> DataFrame:
    """(doc_id, t, n_tokens) with n_tokens coalesced to 0 for NULL
    texts (a NULL text yields NULL spans which the span <> '' gate
    drops, so the coalesce is presentation-only — it keeps q178's
    output columns NULL-free where the oracle's are).

    Round 13 measured and rejected a spread_scan here: it buys q174
    ~1 s (3.9→3.1 warm) but costs q178 ~2 s with erratic spread
    (3.2-3.8 stable → 3.9-7.4) — q178 consumes base TWICE (islands
    chain + rewrite join) and pays the added text exchange per leg."""
    toks = d.select("doc_id", _text_tokens(F.col("text")).alias("t"))
    return toks.select(
        "doc_id",
        "t",
        F.coalesce(
            F.when(F.col("t").isNotNull(), F.size("t")), F.lit(0)
        ).cast("bigint").alias("n_tokens"),
    )


def _exploded_spans(base: DataFrame) -> DataFrame:
    """Positional {SPAN_K}-token span stream (doc_id, n_tokens, i,
    span) — the shared front of the span tier (q174/q178 islands,
    q180 decontamination). Map-side-free explode; recomputed per
    consumer by design (persisting the exploded corpus would spill
    multiples of the input at scale)."""
    idx = F.sequence(
        F.lit(0), F.greatest(F.size(F.col("t")) - SPAN_K, F.lit(0))
    )
    return base.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.cast("bigint").alias("i"),
                    F.array_join(
                        F.slice(F.col("t"), i + 1, SPAN_K), " "
                    ).alias("span"),
                ),
            )
        ).alias("s"),
    ).select(
        "doc_id", "n_tokens", F.col("s.i").alias("i"), F.col("s.span").alias("span")
    ).filter(F.col("span") != "")


def _excision_islands(base: DataFrame) -> DataFrame:
    """Shared q174/q178 chain (round 10: extracted verbatim from the
    driver-certified q174 body): exploded spans → top-{SPAN_TOP}
    registry → broadcast hit probe → doc-partitioned ROWS-frame
    interval union. Returns one row per MERGED excision island:
    (doc_id, isl_id, n_tokens, occ, s, e) with [s, e] the 0-based
    inclusive token range to excise. Plan shape documented on q174."""
    spans = _exploded_spans(base)
    reg = (
        spans.groupBy("span")
        .agg(
            F.count_distinct(F.col("doc_id")).alias("nd"),
            F.count("*").alias("no"),
        )
        .filter(F.col("nd") >= SPAN_MIN_DF)
        .orderBy(F.col("nd").desc(), F.col("no").desc(), "span")
        .limit(SPAN_TOP)
        .select("span")
    )
    hits = spans.join(F.broadcast(reg), "span").select(
        "doc_id",
        "n_tokens",
        "i",
        (F.least(F.col("i") + SPAN_K, F.col("n_tokens")) - 1).alias("fin"),
    )
    return _merge_islands(hits)


def _merge_islands(hits: DataFrame) -> DataFrame:
    """Doc-partitioned ROWS-frame interval union over a positional hit
    stream (doc_id, n_tokens, i, fin) — shared by the span registry
    tier (q174/q178) and the decontamination apply (q185). Task size
    is bounded by one document's hits; overlapping/adjacent-start
    spans coalesce into merged islands (doc_id, isl_id, n_tokens,
    occ, s, e), [s, e] the 0-based inclusive token range to excise."""
    w_ord = W.partitionBy("doc_id").orderBy("i")
    pm = F.max("fin").over(w_ord.rowsBetween(W.unboundedPreceding, -1))
    isl = hits.withColumn(
        "new_isl",
        F.when(pm.isNull() | (F.col("i") > pm), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "isl_id",
        F.sum("new_isl")
        .over(w_ord.rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint"),
    )
    return isl.groupBy("doc_id", "isl_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.count("*").cast("bigint").alias("occ"),
        F.min("i").alias("s"),
        F.max("fin").alias("e"),
    )


@declared(
    "q174_span_excision",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       base AS (SELECT doc_id, t, len(t) AS n_tokens FROM toks),
       spans AS (
         SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS i,
                array_to_string(t[CAST(i+1 AS BIGINT):CAST(i+{SPAN_K} AS BIGINT)],
                                ' ') AS span
         FROM base,
              UNNEST(range(greatest(n_tokens - {SPAN_K - 1}, 1))) AS u(i)),
       f AS (SELECT * FROM spans WHERE span <> ''),
       reg AS (
         SELECT span,
                COUNT(DISTINCT doc_id) AS nd, COUNT(*) AS no
         FROM f GROUP BY span
         HAVING COUNT(DISTINCT doc_id) >= {SPAN_MIN_DF}
         ORDER BY nd DESC, no DESC, span LIMIT {SPAN_TOP}),
       hits AS (
         SELECT s.doc_id, s.n_tokens, s.i,
                LEAST(s.i + {SPAN_K}, s.n_tokens) - 1 AS fin
         FROM f s JOIN reg r ON s.span = r.span),
       ord AS (
         SELECT doc_id, n_tokens, i, fin,
                MAX(fin) OVER (PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         FROM hits),
       isl AS (
         SELECT doc_id, n_tokens, i, fin,
                CAST(SUM(CASE WHEN pm IS NULL OR i > pm THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY i
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl_id
         FROM ord),
       m AS (
         SELECT doc_id, isl_id, MAX(n_tokens) AS n_tokens,
                CAST(COUNT(*) AS BIGINT) AS occ,
                MIN(i) AS s, MAX(fin) AS e
         FROM isl GROUP BY doc_id, isl_id)
       SELECT doc_id,
              CAST(SUM(occ) AS BIGINT) AS n_occ,
              CAST(COUNT(*) AS BIGINT) AS n_islands,
              CAST(SUM(e - s + 1) AS BIGINT) AS tokens_masked,
              CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
              CAST((SUM(e - s + 1) * 1000000) // MAX(n_tokens)
                   AS BIGINT) AS masked_ratio_e6
       FROM m GROUP BY doc_id ORDER BY doc_id""",
)
def q174(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-dedup APPLY accounting (round 9) — the stage between
    q159's repeated-span REGISTRY and an actual excision rewrite: for
    every document that contains at least one registry span, how many
    hits land, how many MERGED excision islands they form (overlapping
    same-length spans coalesce — the interval-union step real excision
    needs, which q118's per-doc exposure ratio doesn't do), and how
    many tokens excision would delete (exact union length, integer-e6
    ratio). Completes the span tier's find→decide→apply story the way
    q150/q151 complete the doc-level tiers.

    Plan shape at 100 TB: the exploded-span frame is computed twice
    (registry aggregate, then hit probe) — recomputation is the right
    call at scale since explode is map-side-free while persisting the
    exploded corpus would spill multiples of the input; the {TOP}-row
    registry broadcasts to the probe join; the interval merge is two
    ROWS-frame windows partitioned by doc_id (task size bounded by ONE
    document's hits) followed by two co-partitioned hash aggregates.
    No global sort before the final presentation ORDER BY; NULL doc_id
    rows form one ordinary window/group key on both engines (no
    equi-join on the nullable key anywhere)."""
    m = _excision_islands(_span_base(T(spark, sf, "documents")))
    return (
        m.groupBy("doc_id")
        .agg(
            F.sum("occ").cast("bigint").alias("n_occ"),
            F.count("*").cast("bigint").alias("n_islands"),
            F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("tokens_masked"),
            F.max("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "masked_ratio_e6",
            F.expr("CAST((tokens_masked * 1000000) DIV n_tokens AS BIGINT)"),
        )
        .orderBy("doc_id")
    )


q174.__doc__ = q174.__doc__.replace("{TOP}", str(SPAN_TOP))


@declared(
    "q178_span_excision_rewrite",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       base AS (SELECT doc_id, t, COALESCE(len(t), 0) AS n_tokens FROM toks),
       spans AS (
         SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS i,
                array_to_string(t[CAST(i+1 AS BIGINT):CAST(i+{SPAN_K} AS BIGINT)],
                                ' ') AS span
         FROM base,
              UNNEST(range(greatest(n_tokens - {SPAN_K - 1}, 1))) AS u(i)),
       f AS (SELECT * FROM spans WHERE span <> ''),
       reg AS (
         SELECT span, COUNT(DISTINCT doc_id) AS nd, COUNT(*) AS no
         FROM f GROUP BY span
         HAVING COUNT(DISTINCT doc_id) >= {SPAN_MIN_DF}
         ORDER BY nd DESC, no DESC, span LIMIT {SPAN_TOP}),
       hits AS (
         SELECT s.doc_id, s.i,
                LEAST(s.i + {SPAN_K}, s.n_tokens) - 1 AS fin
         FROM f s JOIN reg r ON s.span = r.span),
       ord AS (
         SELECT doc_id, i, fin,
                MAX(fin) OVER (PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         FROM hits),
       isl AS (
         SELECT doc_id, i, fin,
                CAST(SUM(CASE WHEN pm IS NULL OR i > pm THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY i
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl_id
         FROM ord),
       m AS (SELECT doc_id, isl_id, MIN(i) AS s, MAX(fin) AS e
             FROM isl GROUP BY doc_id, isl_id),
       isln AS (SELECT doc_id, list({{'s': s, 'e': e}}) AS isls
                FROM m GROUP BY doc_id),
       j AS (SELECT b.doc_id, b.t, b.n_tokens, i.isls
             FROM base b LEFT JOIN isln i ON b.doc_id = i.doc_id)
       SELECT doc_id,
              CASE WHEN t IS NULL THEN NULL
                   WHEN isls IS NULL THEN COALESCE(array_to_string(t, ' '), '')
                   ELSE COALESCE(array_to_string(list_filter(t, (x, k) ->
                        len(list_filter(isls, r ->
                            (k-1) >= r.s AND (k-1) <= r.e)) = 0), ' '), '')
              END AS text_clean,
              CAST(n_tokens AS BIGINT) AS n_tokens,
              CAST(CASE WHEN t IS NULL THEN 0
                   WHEN isls IS NULL THEN len(t)
                   ELSE len(list_filter(t, (x, k) ->
                        len(list_filter(isls, r ->
                            (k-1) >= r.s AND (k-1) <= r.e)) = 0))
              END AS BIGINT) AS n_kept
       FROM j ORDER BY doc_id, text_clean""",
)
def q178(spark: SparkSession, sf: str) -> DataFrame:
    """Span-excision REWRITE (round 10 — VERDICT r9 next-round #3):
    emit the excised corpus itself, completing the span tier's
    find (q159) → decide (q159 registry) → account (q174) →
    **rewrite** story the way q150/q151 completed doc-level dedup.
    One output row per input document: tokens covered by any merged
    excision island are deleted, survivors re-joined to text.

    Plan shape at 100 TB: the island chain is the shared
    driver-certified q174 pipeline (broadcast registry probe, ROWS-
    frame interval union bounded by one doc's hits); the per-doc
    island LIST (sorted collect_list over ≤ hits-per-doc merged
    intervals — tiny by construction) left-joins back to the corpus
    and the rewrite walks the gaps BETWEEN the sorted islands and
    slices the token array segment-wise (Catalyst higher-order
    transform/slice/aggregate, O(tokens + islands) per doc — round 12
    replaced the per-token membership lambda the hot-doc probe
    measured at O(tokens x islands)) — per-row, JVM-side, zero
    additional shuffle beyond the island agg + one co-keyed join.
    Never a positional explode of the corpus (that would rebuild
    every document through a shuffle). Docs with no hits pass through
    verbatim via the NULL island branch; NULL doc_ids keep full text
    on both engines (equi-join drops NULL keys — same contract as the
    oracle's LEFT JOIN). Exactly-SQL-expressible, so hash-matched:
    DuckDB 1.0 mirrors the indexed/nested lambda natively (dialect
    trap: its array_to_string([]) is NULL where Spark's array_join([])
    is '' — the oracle COALESCEs all-excised/empty docs to '')."""
    base = _span_base(T(spark, sf, "documents"))
    isln = _excision_islands(base).groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("isls")
    )
    j = base.join(isln, ["doc_id"], "left")
    return j.select(
        "doc_id", *_rewrite_cols()
    ).orderBy("doc_id", "text_clean")


# The kept [a, b] (0-based, inclusive) token-index segments BETWEEN a
# row's merged excision islands — the gap before each island (indexed
# access to the previous island's end, O(1) per island) plus the tail
# gap after the last island. Requires ``isls`` SORTED ascending by s
# (sort_array at the collect site) and disjoint (guaranteed by the
# island merge). O(islands) per row — the round-12 replacement for the
# per-token membership lambda, which was O(tokens x islands) per doc
# and blew up on the hot-DOC probe (SCALE_r12.md: a tiled mega-doc
# holds one island per ~56-token tile, so a 500k-token doc carries
# ~9k islands and the old rewrite did ~4.5e9 interval checks TWICE).
_SEGS_SQL = """concat(
    filter(
      transform(isls, (r, i) -> struct(
        CAST(IF(i = 0, 0, element_at(isls, i).e + 1) AS BIGINT) AS a,
        CAST(r.s - 1 AS BIGINT) AS b)),
      g -> g.a <= g.b),
    IF(element_at(isls, -1).e + 1 <= n_tokens - 1,
       array(struct(CAST(element_at(isls, -1).e + 1 AS BIGINT) AS a,
                    CAST(n_tokens - 1 AS BIGINT) AS b)),
       CAST(array() AS array<struct<a:bigint,b:bigint>>)))"""


def _rewrite_cols() -> list:
    """The excision-rewrite projection shared by q178/q185: expects
    columns (t, n_tokens, isls) in scope — ``isls`` sorted ascending —
    and yields text_clean / n_tokens / n_kept. Docs with no islands
    pass through verbatim; NULL texts stay NULL with n_kept 0
    (matching the oracles' CASE arms).

    Round 12: the rewrite walks the GAPS between islands and slices
    the token array segment-wise (O(tokens + islands) per doc), and
    n_kept sums segment lengths WITHOUT touching the token array
    (O(islands)). The previous per-token `filter(t, k -> !exists(isls,
    ...))` lambda was O(tokens x islands) and ran twice (text_clean +
    n_kept); identical output, hash-certified both shapes."""
    text_clean = F.expr(
        f"""CASE WHEN t IS NULL THEN NULL
             WHEN isls IS NULL THEN array_join(t, ' ')
             ELSE array_join(flatten(transform({_SEGS_SQL},
                  g -> slice(t, CAST(g.a + 1 AS INT),
                             CAST(g.b - g.a + 1 AS INT)))), ' ')
        END"""
    ).alias("text_clean")
    n_kept = F.expr(
        f"""CAST(CASE WHEN t IS NULL THEN 0
             WHEN isls IS NULL THEN size(t)
             ELSE aggregate({_SEGS_SQL}, CAST(0 AS BIGINT),
                            (acc, g) -> acc + g.b - g.a + 1)
        END AS BIGINT)"""
    ).alias("n_kept")
    return [text_clean, F.col("n_tokens"), n_kept]


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk) + benchmark decontamination (r10)
# ---------------------------------------------------------------------------

PACK_TOKENS = 512  # training-sequence budget (tokens per pack)
# doc_ids per prefix-sum bucket. Sizing is the two-level tradeoff: the
# within-bucket window task scans <= PACK_IDBUCKET docs, and the
# bucket-subtotal window scans n_docs/PACK_IDBUCKET rows in ONE task.
# 65536 keeps both ends sane to ~100B docs (1.5M narrow bucket rows —
# seconds sequentially); a corpus past that adds a third level, same
# decomposition. The constant cannot change RESULTS — it only
# partitions the exact prefix-sum computation.
PACK_IDBUCKET = 65536


def _pack_placement(spark: SparkSession, sf: str) -> DataFrame:
    """Shared q179/q184 front: the exact global prefix sum placing each
    document in the concatenated token stream — (doc_id, n_tokens,
    start_off). Two-level bucket decomposition (plan shape documented
    on q179); recomputed per consumer by design — it is three narrow
    aggregates over the corpus, cheaper at scale than persisting."""
    d = T(spark, sf, "documents").where(F.col("doc_id").isNotNull())
    nt = F.coalesce(
        F.when(
            F.col("t").isNotNull(), F.size("t").cast("bigint")
        ),
        F.lit(0).cast("bigint"),
    )
    g = (
        d.select("doc_id", _text_tokens(F.col("text")).alias("t"))
        .select("doc_id", nt.alias("nt"))
        .groupBy("doc_id")
        .agg(F.sum("nt").cast("bigint").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("bkt", F.expr(f"doc_id DIV {PACK_IDBUCKET}"))
    )
    wb = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    boff = (
        g.groupBy("bkt")
        .agg(F.sum("n_tokens").alias("bt"))
        .select(
            "bkt",
            F.coalesce(F.sum("bt").over(wb), F.lit(0).cast("bigint")).alias(
                "boff"
            ),
        )
    )
    w_in = (
        W.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return g.join(F.broadcast(boff), "bkt").select(
        "doc_id",
        "n_tokens",
        (
            F.col("boff")
            + F.coalesce(
                F.sum("n_tokens").over(w_in), F.lit(0).cast("bigint")
            )
        ).alias("start_off"),
    )


@declared(
    "q179_sequence_packing",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents
         WHERE doc_id IS NOT NULL),
       g AS (SELECT doc_id,
                    CAST(SUM(COALESCE(len(t), 0)) AS BIGINT) AS n_tokens
             FROM toks GROUP BY doc_id),
       f AS (SELECT doc_id, n_tokens FROM g WHERE n_tokens > 0),
       c AS (SELECT doc_id, n_tokens,
                    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS start_off
             FROM f)
       SELECT doc_id, n_tokens, start_off,
              CAST(start_off // {PACK_TOKENS} AS BIGINT) AS pack_first,
              CAST((start_off + n_tokens - 1) // {PACK_TOKENS} AS BIGINT)
                AS pack_last,
              CAST((start_off + n_tokens - 1) // {PACK_TOKENS}
                   - start_off // {PACK_TOKENS} + 1 AS BIGINT)
                AS packs_spanned,
              CAST(start_off % {PACK_TOKENS} AS BIGINT) AS off_in_pack
       FROM c ORDER BY doc_id""",
)
def q179(spark: SparkSession, sf: str) -> DataFrame:
    """Training-sequence packing, concat-and-chunk style (round 10):
    documents concatenate in doc_id order into one global token
    stream chunked into {PACK}-token packs; each doc's placement is
    (start_off, pack_first, pack_last, packs_spanned, off_in_pack) —
    docs may split across pack boundaries, exactly how LLM
    pretraining packs corpora (GPT-3/Llama concat-and-chunk). The
    whole operator is ONE exact global prefix sum, so the oracle is
    plain window SQL.

    Scale shape (the reason this isn't one ORDER BY window): a global
    cumulative sum over 100 TB cannot ride a single-partition window.
    Two-level decomposition instead — per-doc token counts hash-
    aggregate into doc_id-bucket subtotals ({IDB} ids per bucket);
    the bucket-level running offset is a window over n_docs/{IDB}
    narrow rows — one task, fine to ~100B docs at this bucket size,
    and a third level of the same decomposition covers anything past
    that; the within-
    bucket prefix sum is a window PARTITIONED by bucket, task size
    bounded by {IDB} docs. NULL doc_ids are excluded on both engines
    (packing needs a total order key); empty/NULL texts occupy no
    stream positions. Duplicate doc_ids (degenerate fixtures) merge
    into one stream slot via the per-doc pre-aggregate, keeping the
    prefix sum deterministic under ties."""
    c = _pack_placement(spark, sf)
    return c.select(
        "doc_id",
        "n_tokens",
        "start_off",
        F.expr(f"CAST(start_off DIV {PACK_TOKENS} AS BIGINT)").alias(
            "pack_first"
        ),
        F.expr(
            f"CAST((start_off + n_tokens - 1) DIV {PACK_TOKENS} AS BIGINT)"
        ).alias("pack_last"),
        F.expr(
            f"CAST((start_off + n_tokens - 1) DIV {PACK_TOKENS} "
            f"- start_off DIV {PACK_TOKENS} + 1 AS BIGINT)"
        ).alias("packs_spanned"),
        F.expr(f"CAST(start_off % {PACK_TOKENS} AS BIGINT)").alias(
            "off_in_pack"
        ),
    ).orderBy("doc_id")


q179.__doc__ = q179.__doc__.replace("{PACK}", str(PACK_TOKENS)).replace(
    "{IDB}", str(PACK_IDBUCKET)
)

DECON_MOD = 97  # doc_id % MOD == 0 -> the held-out benchmark split
# Bench-side span document-frequency cap for q180 (round 11 — the
# third-decade probe caught the blowup): a span held by B bench docs
# and matched at C corpus positions fans the hit join out to B*C rows,
# so ubiquitous spans turn the probe quadratic (measured 16.9x at
# 50k->500k docs vs ~9x for every sibling). A span in >100 distinct
# benchmark docs is boilerplate, not contamination signal — the same
# stop-gram argument as ngram_jaccard_pairs' max_doc_freq — and
# dropping it bounds the per-span fan-out by construction. No effect
# at the gate scales (the sf0.01/sf0.1 bench splits hold <= 52 docs).
DECON_SPAN_MAX_BDF = 100
# Broadcast guard for q180: a fixture-derived modulo split grows linearly
# with the corpus (unlike a real eval set, which is bounded by nature), so
# past this many distinct (span, bench_doc) pairs the plan falls back to a
# shuffle hash join instead of OOMing the driver/executors with the build.
DECON_BENCH_BROADCAST_MAX = 2_000_000


def _maybe_broadcast(df: DataFrame, cap: int | None = None) -> DataFrame:
    """Size guard (ADVICE r10) shared by the decontamination tier: count
    the build side (limit-bounded) before forcing the broadcast; past
    the cap, return the frame unhinted so the join shuffles instead of
    OOMing the driver. The cap is read at CALL time (not def time) so
    tests can lower DECON_BENCH_BROADCAST_MAX and exercise the shuffle
    fallback (ADVICE r11 #2). Callers pass a PERSISTED frame
    (_guarded_bench_spans) so the guard's count and the probe join
    share one computation of the bench pipeline."""
    if cap is None:
        cap = DECON_BENCH_BROADCAST_MAX
    if df.limit(cap + 1).count() <= cap:
        return F.broadcast(df)
    return df


def _guarded_bench_spans(
    spark: SparkSession, sf: str, with_bdoc: bool
) -> DataFrame:
    """The decontamination triad's benchmark span set, built ONCE per
    (session, corpus, shape) and served persisted from the engine's own
    CacheManager afterwards (the q148/q158 plans/shared.py pattern).

    Closes VERDICT r11 #3 / ADVICE r11 #1: the old per-builder guard
    ran ``limit(cap+1).count()`` on the UNPERSISTED aggregate, so q180/
    q185/q186 each tokenized+exploded+distinct'ed the bench split twice
    (once for the guard, once for the join). Here the guard counts the
    persisted frame and the probe join reads the same blocks — one
    bench-side pass per session per shape, visible in the physical
    plan as an InMemoryTableScan under the BroadcastExchange (pytest
    plan guard in tests/test_plans.py).

    NOTE these builders are therefore EAGER: constructing the
    DataFrame runs the guard's count job (materializing the persisted
    bench aggregate). ``shape``: q180 needs (bdoc, span) pairs for its
    per-doc distinct-bench-doc counts; q185/q186 need the span set
    only. Both shapes drop spans held by more than DECON_SPAN_MAX_BDF
    distinct bench docs (boilerplate, not contamination signal — see
    the constant's note)."""
    from iceberg_cache_spark.cache.keys import CacheKey
    from iceberg_cache_spark.plans.shared import corpus_cache

    key = CacheKey.of(
        f"{sf}/documents",
        partition_filter={
            "derived": "decon_bench_spans",
            "k": str(SPAN_K),
            "mod": str(DECON_MOD),
            "max_bdf": str(DECON_SPAN_MAX_BDF),
            "shape": "bdoc" if with_bdoc else "span",
        },
    )

    def loader() -> DataFrame:
        spans = _exploded_spans(_span_base(T(spark, sf, "documents")))
        b = spans.filter(F.col("doc_id") % DECON_MOD == 0)
        if with_bdoc:
            pairs = b.select(F.col("doc_id").alias("bdoc"), "span").distinct()
            rare = (
                pairs.groupBy("span")
                .agg(F.count_distinct("bdoc").alias("bdf"))
                .filter(F.col("bdf") <= DECON_SPAN_MAX_BDF)
                .select("span")
            )
            return pairs.join(rare, "span", "left_semi")
        return (
            b.groupBy("span")
            .agg(F.count_distinct("doc_id").alias("bdf"))
            .filter(F.col("bdf") <= DECON_SPAN_MAX_BDF)
            .select("span")
        )

    # materialize=False: the guard's own count fills the persisted
    # blocks, so admission costs no extra pass (plans/shared.py:68).
    cached = corpus_cache(spark).get_or_load(key, loader, materialize=False)
    return _maybe_broadcast(cached)


@declared(
    "q180_benchmark_decontam",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       base AS (SELECT doc_id, t, COALESCE(len(t), 0) AS n_tokens FROM toks),
       spans AS (
         SELECT doc_id,
                array_to_string(t[CAST(i+1 AS BIGINT):CAST(i+{SPAN_K} AS BIGINT)],
                                ' ') AS span
         FROM base,
              UNNEST(range(greatest(n_tokens - {SPAN_K - 1}, 1))) AS u(i)),
       f AS (SELECT DISTINCT doc_id, span FROM spans WHERE span <> ''),
       bench0 AS (SELECT doc_id AS bdoc, span FROM f
                  WHERE doc_id % {DECON_MOD} = 0),
       bench AS (SELECT b.bdoc, b.span FROM bench0 b
                 JOIN (SELECT span FROM bench0 GROUP BY span
                       HAVING COUNT(DISTINCT bdoc) <= {DECON_SPAN_MAX_BDF})
                      r ON b.span = r.span),
       corp AS (SELECT doc_id, span FROM f
                WHERE doc_id IS NOT NULL AND doc_id % {DECON_MOD} <> 0),
       hit AS (SELECT c.doc_id, c.span, b.bdoc
               FROM corp c JOIN bench b ON c.span = b.span)
       SELECT doc_id,
              CAST(COUNT(DISTINCT span) AS BIGINT) AS n_shared_spans,
              CAST(COUNT(DISTINCT bdoc) AS BIGINT) AS n_bench_docs
       FROM hit GROUP BY doc_id ORDER BY doc_id""",
)
def q180(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination (round 10): flag training documents
    sharing any {K}-token span with the held-out benchmark split
    (doc_id % {MOD} == 0 — the fixture's stand-in for an eval set),
    the GPT-3/Llama n-gram-collision decontamination pass. Output per
    contaminated doc: distinct shared spans and distinct benchmark
    docs matched.

    Scale shape: a REAL eval set is small by nature (thousands of
    docs against a 100 TB corpus) and its distinct (span, bench_doc)
    pairs broadcast, so the corpus span stream is probed map-side
    with NO shuffle of the exploded corpus; the only shuffle is the
    per-doc count-distinct aggregate on the (tiny) hit stream. This
    FIXTURE's bench split is a modulo of the corpus itself, so it
    grows with the corpus — the broadcast is therefore guarded by a
    counted DECON_BENCH_BROADCAST_MAX threshold (shuffle-join
    fallback past it); a production deployment should feed a bounded
    eval-set table here instead of a corpus split. Spans held by more
    than DECON_SPAN_MAX_BDF distinct benchmark docs are dropped before
    the probe (round 11 — the third-decade probe measured the B*C
    hit fan-out at 16.9x per 10x rows without the cap, ~9x with):
    boilerplate, not contamination signal, per q64's stop-gram rule.
    Span explode reuses the q174/q178 positional stream; the bench
    side is built once per session via _guarded_bench_spans (this
    builder is EAGER — see that helper). NULL-doc_id docs PASS
    THROUGH unflagged (round 12, ADVICE r11 #3): the whole triad
    shares one contract — a doc with no id has no join-back key for
    q185's excision, so neither the find (here) nor the accounting
    (q186) reports contamination the apply can never remove."""
    base = _span_base(T(spark, sf, "documents"))
    all_spans = _exploded_spans(base).select("doc_id", "span")
    # the corpus stream keeps its duplicate occurrences (the final
    # count_distinct dedups) — a corpus-wide distinct would shuffle
    # the whole exploded stream; only the broadcast side distincts
    # (inside _guarded_bench_spans)
    corp = all_spans.filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") % DECON_MOD != 0)
    )
    hit = corp.join(_guarded_bench_spans(spark, sf, with_bdoc=True), "span")
    return (
        hit.groupBy("doc_id")
        .agg(
            F.count_distinct("span").cast("bigint").alias("n_shared_spans"),
            F.count_distinct("bdoc").cast("bigint").alias("n_bench_docs"),
        )
        .orderBy("doc_id")
    )


q180.__doc__ = q180.__doc__.replace("{K}", str(SPAN_K)).replace(
    "{MOD}", str(DECON_MOD)
)


@declared(
    "q183_token_count_probe",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents
         WHERE doc_id IS NOT NULL)
       SELECT doc_id, CAST(COALESCE(len(t), 0) AS BIGINT) AS n_tokens
       FROM toks ORDER BY doc_id""",
)
def q183(spark: SparkSession, sf: str) -> DataFrame:
    """One-construct diagnostic probe (round 11, VERDICT r10 #1): the
    q179 packing pipeline's FIRST stage — per-doc token counts — and
    nothing else. q179's global prefix sum amplifies a single
    divergent count into a whole-corpus hash mismatch; when q179 reds,
    this probe bisects it in one look: q183 red → tokenizer drift
    (engine dialect, q169-style localization); q183 green →
    cumsum/packing arithmetic. Pure scan-local map work, no shuffle
    beyond the output sort."""
    d = T(spark, sf, "documents").where(F.col("doc_id").isNotNull())
    return (
        d.select(
            "doc_id",
            F.coalesce(
                F.when(
                    F.col("text").isNotNull(),
                    F.size(_text_tokens(F.col("text"))).cast("bigint"),
                ),
                F.lit(0).cast("bigint"),
            ).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Pack-manifest emit (q184) + decontamination apply (q185) — round 11:
# each completes a find→apply tier the way q178 completed the span tier.
# ---------------------------------------------------------------------------


@declared(
    "q184_pack_manifest",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents
         WHERE doc_id IS NOT NULL),
       g AS (SELECT doc_id,
                    CAST(SUM(COALESCE(len(t), 0)) AS BIGINT) AS n_tokens
             FROM toks GROUP BY doc_id),
       f AS (SELECT doc_id, n_tokens FROM g WHERE n_tokens > 0),
       c AS (SELECT doc_id, n_tokens,
                    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS start_off
             FROM f),
       e AS (SELECT doc_id, n_tokens, start_off, CAST(p AS BIGINT) AS pack_id
             FROM c,
                  UNNEST(range(start_off // {PACK_TOKENS},
                               (start_off + n_tokens - 1) // {PACK_TOKENS}
                               + 1)) AS u(p))
       SELECT pack_id, doc_id,
              CAST(GREATEST(pack_id * {PACK_TOKENS} - start_off, 0)
                   AS BIGINT) AS slice_start,
              CAST(LEAST(start_off + n_tokens,
                         (pack_id + 1) * {PACK_TOKENS})
                   - GREATEST(start_off, pack_id * {PACK_TOKENS})
                   AS BIGINT) AS slice_len,
              CAST(GREATEST(start_off, pack_id * {PACK_TOKENS})
                   - pack_id * {PACK_TOKENS} AS BIGINT) AS pos_in_pack
       FROM e ORDER BY pack_id, pos_in_pack""",
)
def q184(spark: SparkSession, sf: str) -> DataFrame:
    """Pack-manifest EMIT (round 11 — VERDICT r10 next-round #5): q179
    places each document in the global token stream; this emits the
    per-PACK manifest a training loader actually consumes — one row
    per (pack, doc-slice): which slice of which document fills which
    positions of pack ``pack_id``. ``slice_start``/``slice_len`` index
    into the DOCUMENT's tokens, ``pos_in_pack`` into the pack; rows of
    one pack are ordered and gap-free by construction (boundary docs
    split across consecutive packs). Completes pack-place → pack-emit
    the way q178 completed the span tier's find → rewrite.

    Scale shape: the placement is the shared q179 two-level exact
    prefix sum (recomputed, not persisted); the manifest explode is
    map-side-free — sequence(pack_first..pack_last) per doc, total
    rows = n_docs + total_tokens/{PACK} — and every output column is
    integer arithmetic on (start_off, n_tokens, pack_id), so no
    further shuffle before the presentation sort. Pure-integer
    derivation from the driver-certified placement keeps it exactly
    SQL-expressible (hash-matched oracle). Parity model: extends the
    reference's golden-row discipline
    (src/tests/test_sql_query_engine.py:28-33) to the packing tier."""
    return _pack_manifest(spark, sf).select(
        "pack_id", "doc_id", "slice_start", "slice_len", "pos_in_pack"
    ).orderBy("pack_id", "pos_in_pack")


# Max elements in any single generated pack-index array (q184/q187
# manifest explode). A doc's pack sequence is n_tokens/512 long — fine
# for real corpora (a 10M-token outlier is ~20k elements), but the
# same guard philosophy as sessions.GAPFILL_SLAB applies: one corrupt
# mega-doc must not materialize an unbounded array on a single row, so
# the explode is slab-chunked (slab index first, then a <=65536-pack
# slab). Identical rows; worst case bounded by the constant.
PACK_SLAB = 65536


def _pack_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """Shared q184/q187 manifest frame: placement exploded into one row
    per (pack_id, doc-slice), carrying the doc's n_tokens so the stats
    tier can classify whole-vs-split slices without a re-join."""
    P = PACK_TOKENS
    c = _pack_placement(spark, sf).select(
        "doc_id",
        "n_tokens",
        "start_off",
        F.expr(f"start_off DIV {P}").alias("p0"),
        F.expr(f"(start_off + n_tokens - 1) DIV {P}").alias("p1"),
    )
    slabs = c.select(
        "doc_id",
        "n_tokens",
        "start_off",
        "p0",
        "p1",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.expr(f"(p1 - p0) DIV {PACK_SLAB}"),
            )
        ).alias("s"),
    )
    e = slabs.select(
        "doc_id",
        "n_tokens",
        "start_off",
        F.explode(
            F.sequence(
                F.col("p0") + F.col("s") * F.lit(PACK_SLAB),
                F.least(
                    F.col("p1"),
                    F.col("p0") + (F.col("s") + 1) * F.lit(PACK_SLAB) - 1,
                ),
            )
        ).alias("pack_id"),
    )
    gstart = F.greatest(F.col("start_off"), F.col("pack_id") * P)
    gend = F.least(
        F.col("start_off") + F.col("n_tokens"), (F.col("pack_id") + 1) * P
    )
    return e.select(
        F.col("pack_id").cast("bigint").alias("pack_id"),
        "doc_id",
        "n_tokens",
        (gstart - F.col("start_off")).cast("bigint").alias("slice_start"),
        (gend - gstart).cast("bigint").alias("slice_len"),
        (gstart - F.col("pack_id") * P).cast("bigint").alias("pos_in_pack"),
    )


q184.__doc__ = q184.__doc__.replace("{PACK}", str(PACK_TOKENS))


@declared(
    "q185_decontam_rewrite",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       base AS (SELECT doc_id, t, COALESCE(len(t), 0) AS n_tokens FROM toks),
       spans AS (
         SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS i,
                array_to_string(t[CAST(i+1 AS BIGINT):CAST(i+{SPAN_K} AS BIGINT)],
                                ' ') AS span
         FROM base,
              UNNEST(range(greatest(n_tokens - {SPAN_K - 1}, 1))) AS u(i)),
       f AS (SELECT * FROM spans WHERE span <> ''),
       bench AS (SELECT span FROM f WHERE doc_id % {DECON_MOD} = 0
                 GROUP BY span
                 HAVING COUNT(DISTINCT doc_id) <= {DECON_SPAN_MAX_BDF}),
       hits AS (
         SELECT s.doc_id, s.i,
                LEAST(s.i + {SPAN_K}, s.n_tokens) - 1 AS fin
         FROM f s JOIN bench b ON s.span = b.span
         WHERE s.doc_id IS NOT NULL AND s.doc_id % {DECON_MOD} <> 0),
       ord AS (
         SELECT doc_id, i, fin,
                MAX(fin) OVER (PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         FROM hits),
       isl AS (
         SELECT doc_id, i, fin,
                CAST(SUM(CASE WHEN pm IS NULL OR i > pm THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY i
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl_id
         FROM ord),
       m AS (SELECT doc_id, isl_id, MIN(i) AS s, MAX(fin) AS e
             FROM isl GROUP BY doc_id, isl_id),
       isln AS (SELECT doc_id, list({{'s': s, 'e': e}}) AS isls
                FROM m GROUP BY doc_id),
       corp AS (SELECT * FROM base
                WHERE doc_id IS NULL OR doc_id % {DECON_MOD} <> 0),
       j AS (SELECT b.doc_id, b.t, b.n_tokens, i.isls
             FROM corp b LEFT JOIN isln i ON b.doc_id = i.doc_id)
       SELECT doc_id,
              CASE WHEN t IS NULL THEN NULL
                   WHEN isls IS NULL THEN COALESCE(array_to_string(t, ' '), '')
                   ELSE COALESCE(array_to_string(list_filter(t, (x, k) ->
                        len(list_filter(isls, r ->
                            (k-1) >= r.s AND (k-1) <= r.e)) = 0), ' '), '')
              END AS text_clean,
              CAST(n_tokens AS BIGINT) AS n_tokens,
              CAST(CASE WHEN t IS NULL THEN 0
                   WHEN isls IS NULL THEN len(t)
                   ELSE len(list_filter(t, (x, k) ->
                        len(list_filter(isls, r ->
                            (k-1) >= r.s AND (k-1) <= r.e)) = 0))
              END AS BIGINT) AS n_kept,
              CAST(CASE WHEN isls IS NULL THEN 0 ELSE 1 END AS BIGINT)
                AS was_contaminated
       FROM j ORDER BY doc_id, text_clean""",
)
def q185(spark: SparkSession, sf: str) -> DataFrame:
    """Decontamination APPLY (round 11 — VERDICT r10 next-round #6):
    q180 flags training docs sharing a {K}-token span with the
    benchmark split; this emits the decontaminated training corpus
    itself — benchmark docs dropped, and in every surviving doc the
    contaminated spans are EXCISED (span-masking, the surgical
    alternative to doc-level kill: a 100k-token doc with one leaked
    quiz question keeps its other 99.99k tokens). Completes the
    decontamination find (q180) → apply triad.

    Plan shape at 100 TB: the benchmark span set distincts and
    broadcasts under the counted {DBM}-entry guard (shuffle-join
    fallback past it — see q180); corpus spans are probed map-side,
    hit intervals union per-doc via the shared q174/q178 ROWS-frame
    island merge (task bounded by one doc's hits), and the rewrite is
    the shared segment-wise gap walk over the sorted islands
    (O(tokens + islands) per doc, see _rewrite_cols — round 12) —
    per-row, JVM-side, never a positional re-explode of the corpus. NULL
    doc_ids pass through verbatim with was_contaminated=0 on both
    engines — and since round 12 they are filtered BEFORE the island
    merge on both engines too (ADVICE r11 #3: the equi-join back to
    isln drops NULL keys anyway, so windowing them was wasted work),
    which is the same pass-through contract q180/q186 now declare.
    Bench side built once per session via _guarded_bench_spans (this
    builder is EAGER — see that helper)."""
    base = _span_base(T(spark, sf, "documents"))
    spans = _exploded_spans(base)
    corp_spans = spans.filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") % DECON_MOD != 0)
    )
    hits = corp_spans.join(
        _guarded_bench_spans(spark, sf, with_bdoc=False), "span"
    ).select(
        "doc_id",
        "n_tokens",
        "i",
        (F.least(F.col("i") + SPAN_K, F.col("n_tokens")) - 1).alias("fin"),
    )
    isln = _merge_islands(hits).groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("isls")
    )
    corp = base.filter(
        F.col("doc_id").isNull() | (F.col("doc_id") % DECON_MOD != 0)
    )
    j = corp.join(isln, ["doc_id"], "left")
    return j.select(
        "doc_id",
        *_rewrite_cols(),
        F.when(F.col("isls").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("bigint")
        .alias("was_contaminated"),
    ).orderBy("doc_id", "text_clean")


q185.__doc__ = q185.__doc__.replace("{K}", str(SPAN_K)).replace(
    "{DBM}", str(DECON_BENCH_BROADCAST_MAX)
)


# Hard-contamination flag threshold for q186: a doc whose contaminated
# token fraction reaches this (in parts-per-million) is marked for
# doc-level kill rather than span excision — 20% leaked content means
# the doc IS substantially benchmark material.
DECON_HARD_E6 = 200_000


@declared(
    "q186_decontam_accounting",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       base AS (SELECT doc_id, t, COALESCE(len(t), 0) AS n_tokens FROM toks),
       spans AS (
         SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS i,
                array_to_string(t[CAST(i+1 AS BIGINT):CAST(i+{SPAN_K} AS BIGINT)],
                                ' ') AS span
         FROM base,
              UNNEST(range(greatest(n_tokens - {SPAN_K - 1}, 1))) AS u(i)),
       f AS (SELECT * FROM spans WHERE span <> ''),
       bench AS (SELECT span FROM f WHERE doc_id % {DECON_MOD} = 0
                 GROUP BY span
                 HAVING COUNT(DISTINCT doc_id) <= {DECON_SPAN_MAX_BDF}),
       hits AS (
         SELECT s.doc_id, s.n_tokens, s.i,
                LEAST(s.i + {SPAN_K}, s.n_tokens) - 1 AS fin
         FROM f s JOIN bench b ON s.span = b.span
         WHERE s.doc_id IS NOT NULL AND s.doc_id % {DECON_MOD} <> 0),
       ord AS (
         SELECT doc_id, n_tokens, i, fin,
                MAX(fin) OVER (PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         FROM hits),
       isl AS (
         SELECT doc_id, n_tokens, i, fin,
                CAST(SUM(CASE WHEN pm IS NULL OR i > pm THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY i
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl_id
         FROM ord),
       m AS (
         SELECT doc_id, isl_id, MAX(n_tokens) AS n_tokens,
                CAST(COUNT(*) AS BIGINT) AS occ,
                MIN(i) AS s, MAX(fin) AS e
         FROM isl GROUP BY doc_id, isl_id)
       SELECT doc_id,
              CAST(SUM(occ) AS BIGINT) AS n_occ,
              CAST(COUNT(*) AS BIGINT) AS n_islands,
              CAST(SUM(e - s + 1) AS BIGINT) AS tokens_contaminated,
              CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
              CAST((SUM(e - s + 1) * 1000000) // MAX(n_tokens)
                   AS BIGINT) AS contam_ratio_e6,
              CAST(CASE WHEN (SUM(e - s + 1) * 1000000) // MAX(n_tokens)
                        >= {DECON_HARD_E6} THEN 1 ELSE 0 END AS BIGINT)
                AS kill_doc
       FROM m GROUP BY doc_id ORDER BY doc_id""",
)
def q186(spark: SparkSession, sf: str) -> DataFrame:
    """Decontamination ACCOUNTING (round 11): the stage between q180's
    find and q185's apply — for every contaminated training doc, how
    many benchmark-span hits land, how many merged excision islands
    they form, the exact contaminated-token count and e6 ratio, and
    the kill-vs-excise decision (`kill_doc`: ratio ≥ {HARD} ppm means
    the doc is substantially benchmark material — excising would leave
    a husk, so a real pipeline drops it whole; Llama-2-style
    high-overlap kill). Mirrors q174's accounting for the span-dedup
    tier, completing the decontamination find→ACCOUNT→apply triad.

    Plan shape: identical to q185's front (counted-guard broadcast of
    the benchmark span set, built once per session via
    _guarded_bench_spans — this builder is EAGER, see that helper;
    map-side corpus probe, per-doc ROWS-frame island union — see
    q185/q180); the accounting is one co-partitioned hash aggregate on
    the sparse hit stream. Pure integer arithmetic, exactly
    SQL-expressible. NULL-doc_id docs PASS THROUGH unflagged (round
    12, ADVICE r11 #3): the accounting must never report contamination
    q185's keyed excision cannot remove, so the hit stream excludes
    docs with no join-back key — the triad's shared contract."""
    base = _span_base(T(spark, sf, "documents"))
    spans = _exploded_spans(base)
    corp_spans = spans.filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") % DECON_MOD != 0)
    )
    hits = corp_spans.join(
        _guarded_bench_spans(spark, sf, with_bdoc=False), "span"
    ).select(
        "doc_id",
        "n_tokens",
        "i",
        (F.least(F.col("i") + SPAN_K, F.col("n_tokens")) - 1).alias("fin"),
    )
    m = _merge_islands(hits)
    return (
        m.groupBy("doc_id")
        .agg(
            F.sum("occ").cast("bigint").alias("n_occ"),
            F.count("*").cast("bigint").alias("n_islands"),
            F.sum(F.col("e") - F.col("s") + 1)
            .cast("bigint")
            .alias("tokens_contaminated"),
            F.max("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "contam_ratio_e6",
            F.expr(
                "CAST((tokens_contaminated * 1000000) DIV n_tokens AS BIGINT)"
            ),
        )
        .withColumn(
            "kill_doc",
            (F.col("contam_ratio_e6") >= DECON_HARD_E6)
            .cast("bigint"),
        )
        .orderBy("doc_id")
    )


q186.__doc__ = q186.__doc__.replace("{HARD}", str(DECON_HARD_E6))


@declared(
    "q187_pack_stats",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents
         WHERE doc_id IS NOT NULL),
       g AS (SELECT doc_id,
                    CAST(SUM(COALESCE(len(t), 0)) AS BIGINT) AS n_tokens
             FROM toks GROUP BY doc_id),
       f AS (SELECT doc_id, n_tokens FROM g WHERE n_tokens > 0),
       c AS (SELECT doc_id, n_tokens,
                    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS start_off
             FROM f),
       e AS (SELECT doc_id, n_tokens, start_off, CAST(p AS BIGINT) AS pack_id
             FROM c,
                  UNNEST(range(start_off // {PACK_TOKENS},
                               (start_off + n_tokens - 1) // {PACK_TOKENS}
                               + 1)) AS u(p)),
       s AS (SELECT pack_id, doc_id, n_tokens,
                    LEAST(start_off + n_tokens,
                          (pack_id + 1) * {PACK_TOKENS})
                    - GREATEST(start_off, pack_id * {PACK_TOKENS})
                      AS slice_len
             FROM e)
       SELECT pack_id,
              CAST(COUNT(*) AS BIGINT) AS n_slices,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN slice_len = n_tokens THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_whole_docs,
              CAST(SUM(CASE WHEN slice_len <> n_tokens THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_split_slices,
              CAST(SUM(slice_len) AS BIGINT) AS tokens_filled
       FROM s GROUP BY pack_id ORDER BY pack_id""",
)
def q187(spark: SparkSession, sf: str) -> DataFrame:
    """Per-pack composition statistics (round 11): the loader-side
    telemetry over q184's manifest — per pack: slice count, distinct
    docs, docs contained WHOLE vs boundary-split slices, and filled
    tokens (= {PACK} everywhere except the final partial pack). This
    is what an attention-masking/packing-efficiency report reads:
    split-slice fraction drives cross-doc attention leakage, whole-doc
    density drives mask sparsity.

    Plan shape: one co-partitioned hash aggregate over the shared
    manifest frame (pack_id is the natural key; the explode is
    map-side, so the only shuffle is this aggregate + the presentation
    sort). Pure integer arithmetic — hash-matched oracle."""
    mf = _pack_manifest(spark, sf)
    return (
        mf.groupBy("pack_id")
        .agg(
            F.count("*").cast("bigint").alias("n_slices"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum(
                (F.col("slice_len") == F.col("n_tokens")).cast("bigint")
            ).cast("bigint").alias("n_whole_docs"),
            F.sum(
                (F.col("slice_len") != F.col("n_tokens")).cast("bigint")
            ).cast("bigint").alias("n_split_slices"),
            F.sum("slice_len").cast("bigint").alias("tokens_filled"),
        )
        .orderBy("pack_id")
    )


q187.__doc__ = q187.__doc__.replace("{PACK}", str(PACK_TOKENS))


@declared(
    "q188_decontam_bench_report",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       base AS (SELECT doc_id, t, COALESCE(len(t), 0) AS n_tokens FROM toks),
       spans AS (
         SELECT doc_id,
                array_to_string(t[CAST(i+1 AS BIGINT):CAST(i+{SPAN_K} AS BIGINT)],
                                ' ') AS span
         FROM base,
              UNNEST(range(greatest(n_tokens - {SPAN_K - 1}, 1))) AS u(i)),
       f AS (SELECT DISTINCT doc_id, span FROM spans WHERE span <> ''),
       bench0 AS (SELECT doc_id AS bdoc, span FROM f
                  WHERE doc_id % {DECON_MOD} = 0),
       bench AS (SELECT b.bdoc, b.span FROM bench0 b
                 JOIN (SELECT span FROM bench0 GROUP BY span
                       HAVING COUNT(DISTINCT bdoc) <= {DECON_SPAN_MAX_BDF})
                      r ON b.span = r.span),
       corp AS (SELECT doc_id, span FROM spans
                WHERE span <> '' AND doc_id IS NOT NULL
                  AND doc_id % {DECON_MOD} <> 0),
       hit AS (SELECT c.doc_id, c.span, b.bdoc
               FROM corp c JOIN bench b ON c.span = b.span)
       SELECT bdoc AS bench_doc_id,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_corpus_docs,
              CAST(COUNT(DISTINCT span) AS BIGINT) AS n_leaked_spans,
              CAST(COUNT(*) AS BIGINT) AS n_occurrences
       FROM hit GROUP BY bdoc ORDER BY bench_doc_id""",
)
def q188(spark: SparkSession, sf: str) -> DataFrame:
    """Per-BENCHMARK-doc contamination report (round 12): the
    symmetric view of q180 — q180 tells the training side which corpus
    docs to clean; this tells the EVAL owner which benchmark items are
    compromised and how broadly (distinct training docs carrying the
    item's spans, distinct leaked spans, and total corpus-side
    occurrences). A real deployment publishes exactly this table next
    to every eval score ("n of the benchmark's items appear verbatim
    in training data").

    Plan shape: shares q180's entire front — the (bdoc, span) bench
    set is the SAME _guarded_bench_spans cache entry (one bench-side
    pass per session covers both queries; this builder is EAGER, see
    that helper), the corpus span stream is probed map-side, and the
    report is one hash aggregate on the sparse hit stream keyed by
    bdoc instead of doc_id. NULL-doc_id docs pass through unflagged
    (the triad contract). The corpus stream keeps duplicate span
    occurrences so n_occurrences counts real positions (the oracle's
    corp CTE deliberately skips the DISTINCT its q180 twin applies)."""
    base = _span_base(T(spark, sf, "documents"))
    all_spans = _exploded_spans(base).select("doc_id", "span")
    corp = all_spans.filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") % DECON_MOD != 0)
    )
    hit = corp.join(_guarded_bench_spans(spark, sf, with_bdoc=True), "span")
    return (
        hit.groupBy(F.col("bdoc").alias("bench_doc_id"))
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_corpus_docs"),
            F.count_distinct("span").cast("bigint").alias("n_leaked_spans"),
            F.count("*").cast("bigint").alias("n_occurrences"),
        )
        .orderBy("bench_doc_id")
    )


# Packs per training shard for q189. Small at the gate scale (the
# fixtures fill ~55 packs, so 16/shard yields a non-degenerate multi-
# shard manifest); a production run sets this so a shard holds the
# loader's unit of work (e.g. 200k packs ~ 100M tokens per shard) —
# the arithmetic is identical, only the constant changes.
PACKS_PER_SHARD = 16


@declared(
    "q189_shard_manifest",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents
         WHERE doc_id IS NOT NULL),
       g AS (SELECT doc_id,
                    CAST(SUM(COALESCE(len(t), 0)) AS BIGINT) AS n_tokens
             FROM toks GROUP BY doc_id),
       f AS (SELECT doc_id, n_tokens FROM g WHERE n_tokens > 0),
       c AS (SELECT doc_id, n_tokens,
                    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS start_off
             FROM f),
       e AS (SELECT doc_id, n_tokens, start_off, CAST(p AS BIGINT) AS pack_id
             FROM c,
                  UNNEST(range(start_off // {PACK_TOKENS},
                               (start_off + n_tokens - 1) // {PACK_TOKENS}
                               + 1)) AS u(p)),
       s AS (SELECT pack_id // {PACKS_PER_SHARD} AS shard_id, pack_id, doc_id,
                    LEAST(start_off + n_tokens,
                          (pack_id + 1) * {PACK_TOKENS})
                    - GREATEST(start_off, pack_id * {PACK_TOKENS})
                      AS slice_len
             FROM e)
       SELECT CAST(shard_id AS BIGINT) AS shard_id,
              CAST(MIN(pack_id) AS BIGINT) AS first_pack,
              CAST(MAX(pack_id) AS BIGINT) AS last_pack,
              CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
              CAST(COUNT(*) AS BIGINT) AS n_slices,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
              CAST(SUM(slice_len) AS BIGINT) AS tokens_filled
       FROM s GROUP BY shard_id ORDER BY shard_id""",
)
def q189(spark: SparkSession, sf: str) -> DataFrame:
    """Training-SHARD manifest (round 12): groups q184's pack manifest
    into loader shards of {PPS} packs — per shard: pack range, pack/
    slice/doc counts, and filled tokens. This is the unit a data
    loader actually schedules (one shard = one reader task / one
    file), completing the packing tier's place (q179) → pack manifest
    (q184) → pack stats (q187) → SHARD manifest chain.

    Plan shape: the shared manifest frame (two-level exact prefix sum
    + map-side slab-bounded explode — see q184) feeds one hash
    aggregate keyed by pack_id DIV {PPS}; shard_id is arithmetic on
    pack_id, so no extra shuffle beyond the aggregate + presentation
    sort. Pure integer arithmetic, hash-matched oracle."""
    mf = _pack_manifest(spark, sf).withColumn(
        "shard_id",
        F.expr(f"CAST(pack_id DIV {PACKS_PER_SHARD} AS BIGINT)"),
    )
    return (
        mf.groupBy("shard_id")
        .agg(
            F.min("pack_id").cast("bigint").alias("first_pack"),
            F.max("pack_id").cast("bigint").alias("last_pack"),
            F.count_distinct("pack_id").cast("bigint").alias("n_packs"),
            F.count("*").cast("bigint").alias("n_slices"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum("slice_len").cast("bigint").alias("tokens_filled"),
        )
        .orderBy("shard_id")
    )


q189.__doc__ = q189.__doc__.replace("{PPS}", str(PACKS_PER_SHARD))


@declared(
    "q190_source_mixture_plan",
    f"""WITH toks AS (
         SELECT source, {_DUCK_TOKS.format(c='text')} AS t FROM documents
         WHERE doc_id IS NOT NULL),
       per_src AS (
         SELECT source,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(COALESCE(len(t), 0)) AS BIGINT) AS n_tokens
         FROM toks GROUP BY source),
       tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                      CAST(COUNT(*) AS BIGINT) AS n_sources
               FROM per_src)
       SELECT source, n_docs, n_tokens,
              CASE WHEN total_tokens = 0 THEN NULL
                   ELSE CAST(CAST(n_tokens AS HUGEINT) * 1000000
                             // total_tokens AS BIGINT)
              END AS token_share_e6,
              CAST(1000000 // n_sources AS BIGINT) AS target_share_e6,
              CASE WHEN n_tokens = 0 THEN NULL
                   ELSE CAST(CAST(total_tokens AS HUGEINT) * 1000000
                             // (CAST(n_sources AS HUGEINT) * n_tokens)
                             AS BIGINT)
              END AS sample_rate_e6
       FROM per_src, tot ORDER BY source""",
)
def q190(spark: SparkSession, sf: str) -> DataFrame:
    """Source-MIXTURE sampling plan (round 12): the static mixture
    calculation every pretraining data pipeline runs before packing —
    per source: docs, tokens, actual token share, the target share
    (uniform-over-sources here; a production run feeds learned DoReMi/
    downstream-tuned weights — the arithmetic is identical), and the
    sampling rate that rebalances the corpus to the target
    (rate > 1e6 means the source upsamples, i.e. epochs > 1). Fixed-
    point e6 integers end-to-end so both engines agree bit-for-bit.
    The e6 products go through 128-bit intermediates (DECIMAL(38,0)
    here, HUGEINT in the oracle — round 13, ADVICE r12): n_tokens *
    1e6 overflows BIGINT once a source holds ~9.2e12 tokens, squarely
    inside the 100 TB design point; the wide-then-narrow cast keeps
    the output schema BIGINT while the intermediate can hold ~1e38.

    Plan shape at 100 TB: one map-side-combinable hash aggregate per
    source (sources number in the dozens), then the 1-row totals
    broadcast back over the per-source frame — the same
    broadcast-singleton pattern as the engine's other global-ratio
    queries; no corpus-sized shuffle anywhere. Zero-token guards are
    explicit CASE/NULL on both engines (ANSI-safe: neither engine
    divides by zero)."""
    d = T(spark, sf, "documents").where(F.col("doc_id").isNotNull())
    per_src = d.select(
        "source",
        F.coalesce(
            F.when(
                F.col("text").isNotNull(),
                F.size(_text_tokens(F.col("text"))).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
        ).alias("toks"),
    ).groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
    )
    tot = per_src.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.count("*").cast("bigint").alias("n_sources"),
    )
    j = per_src.crossJoin(F.broadcast(tot))
    return j.select(
        "source",
        "n_docs",
        "n_tokens",
        F.when(F.col("total_tokens") == 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.expr(
                "CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000"
                " DIV total_tokens AS BIGINT)"
            )
        )
        .alias("token_share_e6"),
        F.expr("CAST(1000000 DIV n_sources AS BIGINT)").alias(
            "target_share_e6"
        ),
        F.when(F.col("n_tokens") == 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.expr(
                "CAST(CAST(total_tokens AS DECIMAL(38,0)) * 1000000"
                " DIV (CAST(n_sources AS DECIMAL(38,0)) * n_tokens)"
                " AS BIGINT)"
            )
        )
        .alias("sample_rate_e6"),
    ).orderBy("source")


def _mixture_front(
    spark: SparkSession, sf: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared q191/q194 front: (docs, rates, tot).

    docs  — (doc_id, source, n_toks) for every non-NULL-id document;
    rates — (source, rate_e6), the q190 e6 sampling rate per source
            (DECIMAL(38,0) intermediates, ADVICE r12);
    tot   — 1-row (total_tokens, n_sources) over the FULL per-source
            frame (NULL-source and zero-token groups included — the
            same denominator q190's published plan uses).

    All three are plan fragments, not materializations: per_src/tot are
    map-side-combinable hash aggregates over dozens of groups, and the
    consumers broadcast them back over the corpus scan."""
    d = T(spark, sf, "documents").where(F.col("doc_id").isNotNull())
    docs = d.select(
        "doc_id",
        "source",
        F.coalesce(
            F.when(
                F.col("text").isNotNull(),
                F.size(_text_tokens(F.col("text"))).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
        ).alias("n_toks"),
    )
    per_src = docs.groupBy("source").agg(
        F.sum("n_toks").cast("bigint").alias("n_tokens")
    )
    tot = per_src.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.count("*").cast("bigint").alias("n_sources"),
    )
    rates = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr(
                "CAST(CAST(total_tokens AS DECIMAL(38,0)) * 1000000"
                " DIV (CAST(n_sources AS DECIMAL(38,0)) * n_tokens)"
                " AS BIGINT)"
            )
        )
        .alias("rate_e6"),
    )
    return docs, rates, tot


def _mixture_doc_epochs(docs: DataFrame, rates: DataFrame) -> DataFrame:
    """(doc_id, source, n_toks, n_epochs) for every document the
    mixture APPLY keeps (n_epochs >= 1): rate_e6 DIV 1e6 full replicas
    plus one more iff the doc's deterministic md5-prefix uniform
    (':mix' salt — the q160 A-ES idiom) falls under the fractional
    part. Broadcast rates over the corpus scan; no corpus shuffle."""
    u_e6 = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % F.lit(1000000)
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .select(
            "doc_id",
            "source",
            "n_toks",
            (
                F.expr("rate_e6 DIV 1000000")
                + F.when(u_e6 < F.col("rate_e6") % 1000000, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_epochs"),
        )
        .where(F.col("n_epochs") >= 1)
    )


@declared(
    "q191_source_mixture_apply",
    f"""WITH toks AS (
         SELECT source, {_DUCK_TOKS.format(c='text')} AS t FROM documents
         WHERE doc_id IS NOT NULL),
       per_src AS (
         SELECT source,
                CAST(SUM(COALESCE(len(t), 0)) AS BIGINT) AS n_tokens
         FROM toks GROUP BY source),
       tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                      CAST(COUNT(*) AS BIGINT) AS n_sources
               FROM per_src),
       rates AS (
         SELECT source,
                CASE WHEN n_tokens = 0 THEN 0
                     ELSE CAST(CAST(total_tokens AS HUGEINT) * 1000000
                               // (CAST(n_sources AS HUGEINT) * n_tokens)
                               AS BIGINT)
                END AS rate_e6
         FROM per_src, tot),
       keyed AS (
         SELECT d.doc_id, d.source, r.rate_e6,
                ('0x' || substring(md5(d.doc_id::VARCHAR || ':mix'), 1, 15))
                  ::BIGINT % 1000000 AS u_e6
         FROM documents d JOIN rates r ON d.source = r.source
         WHERE d.doc_id IS NOT NULL),
       kept AS (
         SELECT doc_id, source,
                CAST(rate_e6 // 1000000
                     + CASE WHEN u_e6 < rate_e6 % 1000000 THEN 1 ELSE 0 END
                     AS BIGINT) AS n_epochs
         FROM keyed)
       SELECT doc_id, source, n_epochs,
              CAST(UNNEST(generate_series(0, n_epochs - 1)) AS BIGINT)
                AS epoch
       FROM kept WHERE n_epochs >= 1
       ORDER BY doc_id, epoch""",
)
def q191(spark: SparkSession, sf: str) -> DataFrame:
    """Source-mixture APPLY (round 13, VERDICT r12 Next #6): q190
    computes per-source e6 sampling rates; this materializes the
    rebalanced corpus deterministically, completing the mixture tier's
    find→apply discipline (same shape as decontam q180→q185 and span
    q159→q178). Per doc: n_epochs = rate_e6 DIV 1e6 full replicas,
    plus one more iff the doc's deterministic uniform u_e6 falls under
    the fractional part (rate_e6 MOD 1e6) — so upsampled sources get
    epoch-replicated rows with an `epoch` column (the loader's replica
    index) and downsampled sources keep exactly the rate_e6/1e6
    fraction in expectation, with NO RNG anywhere: u_e6 is the q160
    A-ES md5-prefix idiom salted ':mix' (both engines hash the same
    string to the same 60-bit integer, MOD 1e6 exact in int64), so the
    kept set is bit-stable across engines, runs, and cluster sizes.

    NULL contract: NULL-doc_id docs are excluded up front (the q180
    triad contract — no identity, no mixture row); NULL-source docs
    count toward q190's totals (GROUP BY keeps the NULL group on both
    engines) but drop at the equi-join (NULL matches nothing on either
    engine) — an unattributable doc has no mixture weight to apply.
    Zero-token sources rate 0 → dropped entirely.

    Plan shape at 100 TB: the rates frame is dozens of rows (one per
    source) built by one map-side-combinable hash aggregate, then
    BROADCAST back over the corpus — the scan-side work is one hash +
    integer compare per doc and an explode bounded by the epoch count
    (a source never upsamples past total/n_sources epochs). No
    corpus-sized shuffle anywhere; the presentation sort is the only
    exchange and a production sink would drop it. 128-bit e6
    intermediates as in q190 (ADVICE r12)."""
    docs, rates, _tot = _mixture_front(spark, sf)
    kept = _mixture_doc_epochs(docs, rates)
    return kept.select(
        "doc_id",
        "source",
        "n_epochs",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n_epochs") - 1)
        ).alias("epoch"),
    ).orderBy("doc_id", "epoch")


# Shared train-fraction for the cluster-coherent split (e6 fixed point:
# 90% train / 10% test).
SPLIT_TRAIN_E6 = 900_000

# Oracle tail shared by q192/q193: assignment of EVERY non-NULL-id doc
# to a cluster (its CC label, or itself for singletons never seen in a
# dup pair) and the deterministic split decision hashed on the CLUSTER
# id — so near-dup docs can never straddle the split boundary.
_SPLIT_CTES = f""",
       assign AS (
         SELECT d.doc_id,
                CAST(COALESCE(l.cluster_id, d.doc_id) AS BIGINT)
                  AS cluster_id
         FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
         WHERE d.doc_id IS NOT NULL),
       splits AS (
         SELECT doc_id, cluster_id,
                CASE WHEN ('0x' || substring(
                             md5(cluster_id::VARCHAR || ':split'), 1, 15))
                           ::BIGINT % 1000000 < {SPLIT_TRAIN_E6}
                     THEN 'train' ELSE 'test' END AS split
         FROM assign)"""


def _cluster_splits(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, cluster_id, split) for every non-NULL-id document: the
    Spark twin of _SPLIT_CTES over the session-cached star-CC labels
    (plans/shared.ngram_cc_labels). Split decision = the q160/q191
    md5-prefix uniform of the CLUSTER id (':split' salt, MOD 1e6 exact
    int64) against SPLIT_TRAIN_E6."""
    from iceberg_cache_spark.plans.shared import ngram_cc_labels

    d = T(spark, sf, "documents").where(F.col("doc_id").isNotNull())
    labels = ngram_cc_labels(spark, sf).select(
        F.col("id").alias("doc_id"), F.col("cid").alias("_cid")
    )
    assign = d.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("_cid"), F.col("doc_id"))
        .cast("bigint")
        .alias("cluster_id"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("cluster_id").cast("string"), F.lit(":split")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % F.lit(1_000_000)
    )
    return assign.select(
        "doc_id",
        "cluster_id",
        F.when(u < SPLIT_TRAIN_E6, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@declared(
    "q192_cluster_safe_split",
    _CC_CTE
    + _SPLIT_CTES
    + """
       SELECT doc_id, cluster_id, split FROM splits ORDER BY doc_id""",
)
def q192(spark: SparkSession, sf: str) -> DataFrame:
    """LEAKAGE-SAFE train/test split (round 13): the assignment step
    every training pipeline runs after dedup. q108's plain hash split
    is per-document, so two near-duplicate documents can land on
    opposite sides of the boundary and the held-out set silently
    overlaps the training set — the same failure mode decontamination
    (q180) guards against, but self-inflicted. This split hashes the
    near-dup CLUSTER id instead (star-CC labels of the exact
    n-gram-Jaccard >= 0.5 graph — the q116/q148 oracle components;
    singleton docs, never seen in a dup pair, are their own cluster),
    so an entire cluster moves as one unit: 90% of clusters to train,
    10% to test, deterministically (md5-prefix uniform, no RNG — the
    q160/q191 idiom) and engine-exactly. NULL-doc_id docs are excluded
    (no identity → no membership), the triad contract.

    Plan shape at 100 TB: the labels come from the session's
    derived-intermediate cache (one star-CC per session, shared with
    q148/q150/q158); the assignment is ONE left equi-join on doc_id
    (labels are one row per doc-in-a-dup-pair — typically a few
    percent of the corpus, so AQE broadcasts them; at worst a
    co-partitioned shuffle) plus a per-row hash. No new corpus-sized
    shuffle beyond the presentation sort."""
    return _cluster_splits(spark, sf).orderBy("doc_id")


@declared(
    "q193_split_leakage_audit",
    _CC_CTE
    + _SPLIT_CTES
    + """,
       viol AS (
         SELECT s.split, CAST(COUNT(*) AS BIGINT) AS cross_pairs
         FROM pairs p
         JOIN splits s  ON s.doc_id  = p.id_a
         JOIN splits s2 ON s2.doc_id = p.id_b
         WHERE s.split <> s2.split GROUP BY s.split)
       SELECT s.split,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(COUNT(DISTINCT s.cluster_id) AS BIGINT) AS n_clusters,
              CAST(COALESCE(MAX(v.cross_pairs), 0) AS BIGINT)
                AS cross_split_pairs
       FROM splits s LEFT JOIN viol v ON v.split = s.split
       GROUP BY s.split ORDER BY s.split""",
)
def q193(spark: SparkSession, sf: str) -> DataFrame:
    """Split-leakage AUDIT (round 13): the verification step that makes
    q192's guarantee a measured fact instead of a code comment — per
    split, the doc and cluster counts plus the number of duplicate
    PAIRS whose endpoints landed in different splits. For a
    cluster-coherent split that count is zero BY CONSTRUCTION, and this
    query proves it from the raw pair graph (not from the labels the
    split itself used — auditing the output against the input, the
    find→apply→audit discipline the decontam and span tiers follow).

    Plan shape at 100 TB: the pair graph comes from its own session
    cache entry (plans/shared.ngram_pair_graph — built once, shared
    with the CC label build); the audit joins the (small) pair list to
    the split assignment twice on doc_id and aggregates to 2 rows.
    Never a corpus self-join."""
    from iceberg_cache_spark.plans.shared import ngram_pair_graph

    splits = _cluster_splits(spark, sf)
    pairs = ngram_pair_graph(spark, sf)
    sa = splits.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    viol = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .groupBy(F.col("split_a").alias("split"))
        .agg(F.count("*").cast("bigint").alias("cross_pairs"))
    )
    return (
        splits.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct("cluster_id").cast("bigint").alias("n_clusters"),
        )
        .join(F.broadcast(viol), "split", "left")
        .select(
            "split",
            "n_docs",
            "n_clusters",
            F.coalesce(F.col("cross_pairs"), F.lit(0))
            .cast("bigint")
            .alias("cross_split_pairs"),
        )
        .orderBy("split")
    )


@declared(
    "q194_mixture_conformance_audit",
    f"""WITH toks AS (
         SELECT doc_id, source, {_DUCK_TOKS.format(c='text')} AS t
         FROM documents WHERE doc_id IS NOT NULL),
       docs AS (SELECT doc_id, source,
                       CAST(COALESCE(len(t), 0) AS BIGINT) AS n_toks
                FROM toks),
       per_src AS (
         SELECT source, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
         FROM docs GROUP BY source),
       tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                      CAST(COUNT(*) AS BIGINT) AS n_sources
               FROM per_src),
       rates AS (
         SELECT source,
                CASE WHEN n_tokens = 0 THEN 0
                     ELSE CAST(CAST(total_tokens AS HUGEINT) * 1000000
                               // (CAST(n_sources AS HUGEINT) * n_tokens)
                               AS BIGINT)
                END AS rate_e6
         FROM per_src, tot),
       keyed AS (
         SELECT d.doc_id, d.source, d.n_toks, r.rate_e6,
                ('0x' || substring(md5(d.doc_id::VARCHAR || ':mix'), 1, 15))
                  ::BIGINT % 1000000 AS u_e6
         FROM docs d JOIN rates r ON d.source = r.source),
       kept AS (
         SELECT doc_id, source, n_toks,
                CAST(rate_e6 // 1000000
                     + CASE WHEN u_e6 < rate_e6 % 1000000 THEN 1 ELSE 0 END
                     AS BIGINT) AS n_epochs
         FROM keyed),
       k AS (SELECT * FROM kept WHERE n_epochs >= 1),
       agg AS (
         SELECT source,
                CAST(COUNT(*) AS BIGINT) AS realized_docs,
                CAST(SUM(n_epochs) AS BIGINT) AS realized_rows,
                CAST(SUM(CAST(n_epochs AS HUGEINT) * n_toks) AS BIGINT)
                  AS realized_tokens
         FROM k GROUP BY source),
       ragg AS (SELECT CAST(SUM(realized_tokens) AS BIGINT)
                  AS total_realized FROM agg)
       SELECT a.source, a.realized_docs, a.realized_rows,
              a.realized_tokens,
              CASE WHEN total_realized = 0 THEN NULL
                   ELSE CAST(CAST(a.realized_tokens AS HUGEINT) * 1000000
                             // total_realized AS BIGINT)
              END AS realized_share_e6,
              CAST(1000000 // n_sources AS BIGINT) AS target_share_e6,
              CASE WHEN total_realized = 0 THEN NULL
                   ELSE CAST(CAST(a.realized_tokens AS HUGEINT) * 1000000
                             // total_realized
                             - 1000000 // n_sources AS BIGINT)
              END AS dev_e6
       FROM agg a, ragg, tot ORDER BY a.source""",
)
def q194(spark: SparkSession, sf: str) -> DataFrame:
    """Mixture conformance AUDIT (round 13): the verification step that
    closes the mixture tier's plan (q190) → apply (q191) → AUDIT
    discipline, mirroring q193's role for the split tier — recompute,
    from the APPLIED corpus itself, what mixture actually materialized
    and hold it against the plan's target. Per source kept in the
    rebalanced corpus: distinct docs kept, total epoch-replicated rows,
    realized tokens (epoch-weighted), the realized e6 token share of
    the rebalanced stream, the plan's uniform target share, and the
    signed deviation. The deviation is the OBSERVED residual of q191's
    fractional-epoch sampling (each doc rounds its fractional epoch up
    or down by its hash), so an eval of the sampler's bias reads
    straight off this table — find→apply→audit, measured not asserted.

    NULL contract: inherits q191's exactly — NULL-doc_id docs excluded
    up front, NULL-source docs never survive the rates equi-join, so
    the audit sees precisely the rows the apply emitted. target share
    still divides by the PLAN's n_sources (NULL/zero-token groups
    included), because that is the target q190 published.

    Plan shape at 100 TB: the kept frame is the q191 broadcast-rates
    scan (no corpus shuffle); the audit adds one map-side-combinable
    hash aggregate to dozens of source groups plus two broadcast 1-row
    totals. 128-bit intermediates throughout (DECIMAL(38,0)/HUGEINT —
    the ADVICE r12 overflow-proofing): epoch-weighted token sums cross
    9.2e18 well before 100 TB does."""
    docs, rates, tot = _mixture_front(spark, sf)
    kept = _mixture_doc_epochs(docs, rates)
    agg = kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("realized_docs"),
        F.sum("n_epochs").cast("bigint").alias("realized_rows"),
        F.sum(F.expr("CAST(n_epochs AS DECIMAL(38,0)) * n_toks"))
        .cast("bigint")
        .alias("realized_tokens"),
    )
    ragg = agg.agg(
        F.sum("realized_tokens").cast("bigint").alias("total_realized")
    )
    share = (
        "CAST(CAST(realized_tokens AS DECIMAL(38,0)) * 1000000"
        " DIV total_realized AS BIGINT)"
    )
    return (
        agg.crossJoin(F.broadcast(ragg))
        .crossJoin(F.broadcast(tot.select("n_sources")))
        .select(
            "source",
            "realized_docs",
            "realized_rows",
            "realized_tokens",
            F.when(F.col("total_realized") == 0, F.lit(None).cast("bigint"))
            .otherwise(F.expr(share))
            .alias("realized_share_e6"),
            F.expr("CAST(1000000 DIV n_sources AS BIGINT)").alias(
                "target_share_e6"
            ),
            F.when(F.col("total_realized") == 0, F.lit(None).cast("bigint"))
            .otherwise(
                F.expr(f"{share} - CAST(1000000 DIV n_sources AS BIGINT)")
            )
            .alias("dev_e6"),
        )
        .orderBy("source")
    )


@declared(
    "q195_decontam_source_report",
    f"""WITH toks AS (
         SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents),
       base AS (SELECT doc_id, t, COALESCE(len(t), 0) AS n_tokens FROM toks),
       spans AS (
         SELECT doc_id,
                array_to_string(t[CAST(i+1 AS BIGINT):CAST(i+{SPAN_K} AS BIGINT)],
                                ' ') AS span
         FROM base,
              UNNEST(range(greatest(n_tokens - {SPAN_K - 1}, 1))) AS u(i)),
       f AS (SELECT DISTINCT doc_id, span FROM spans WHERE span <> ''),
       bench0 AS (SELECT doc_id AS bdoc, span FROM f
                  WHERE doc_id % {DECON_MOD} = 0),
       bspans AS (SELECT span FROM bench0 GROUP BY span
                  HAVING COUNT(DISTINCT bdoc) <= {DECON_SPAN_MAX_BDF}),
       corp AS (SELECT doc_id, span FROM spans
                WHERE span <> '' AND doc_id IS NOT NULL
                  AND doc_id % {DECON_MOD} <> 0),
       hit AS (SELECT c.doc_id, c.span FROM corp c
               JOIN bspans b ON c.span = b.span),
       src AS (SELECT doc_id, source FROM documents
               WHERE doc_id IS NOT NULL AND doc_id % {DECON_MOD} <> 0
                 AND source IS NOT NULL),
       fl AS (SELECT s.source,
                     CAST(COUNT(DISTINCT h.doc_id) AS BIGINT)
                       AS n_flagged_docs,
                     CAST(COUNT(DISTINCT h.span) AS BIGINT)
                       AS n_leaked_spans,
                     CAST(COUNT(*) AS BIGINT) AS n_occurrences
              FROM hit h JOIN src s ON h.doc_id = s.doc_id
              GROUP BY s.source),
       tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM src GROUP BY source)
       SELECT t.source, t.n_docs,
              CAST(COALESCE(f2.n_flagged_docs, 0) AS BIGINT)
                AS n_flagged_docs,
              CAST(COALESCE(f2.n_leaked_spans, 0) AS BIGINT)
                AS n_leaked_spans,
              CAST(COALESCE(f2.n_occurrences, 0) AS BIGINT)
                AS n_occurrences,
              CAST(CAST(COALESCE(f2.n_flagged_docs, 0) AS HUGEINT)
                   * 1000000 // t.n_docs AS BIGINT) AS flagged_ppm
       FROM tot t LEFT JOIN fl f2 ON f2.source = t.source
       ORDER BY t.source""",
)
def q195(spark: SparkSession, sf: str) -> DataFrame:
    """Per-SOURCE contamination roll-up (round 13): the ops view of the
    decontamination tier — q180 tells the training side which DOCS to
    clean and q188 tells the eval owner which BENCH ITEMS are burned;
    this tells the INGEST owner which FEED is leaking: per source, the
    corpus docs carrying any benchmark span (count + parts-per-million
    of the source's corpus-side docs), the distinct leaked spans, and
    total span occurrences. A real pipeline alerts on flagged_ppm per
    feed — a crawler that starts mirroring an eval-hosting site shows
    up as one source's ppm stepping, which doc- and bench-keyed views
    bury.

    Contracts: the corpus side keeps duplicate span occurrences
    (q188's position-true counting); NULL-doc_id docs pass through
    unflagged and NULL-SOURCE docs are excluded from this report
    entirely — an unattributable doc has no feed to attribute leakage
    to (the q191 equi-join contract; a LEFT JOIN would silently drop
    the NULL group's flags on both engines anyway, so exclusion is the
    honest spelling of the same fact).

    Plan shape at 100 TB: the bench side is the SAME per-session
    _guarded_bench_spans cache entry q185/q186 read (span shape — this
    builder is therefore EAGER, see EAGER_QUERIES); the corpus span
    stream is probed map-side; the (sparse) hit stream joins doc->
    source as the SMALL side of an equi-join against the corpus doc
    list (AQE broadcasts it), then two hash aggregates to dozens of
    source groups. No corpus-sized shuffle anywhere."""
    base = _span_base(T(spark, sf, "documents"))
    all_spans = _exploded_spans(base).select("doc_id", "span")
    corp = all_spans.filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") % DECON_MOD != 0)
    )
    hit = corp.join(_guarded_bench_spans(spark, sf, with_bdoc=False), "span")
    src = (
        T(spark, sf, "documents")
        .where(
            F.col("doc_id").isNotNull()
            & (F.col("doc_id") % DECON_MOD != 0)
            & F.col("source").isNotNull()
        )
        .select("doc_id", "source")
    )
    fl = (
        hit.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_flagged_docs"),
            F.count_distinct("span").cast("bigint").alias("n_leaked_spans"),
            F.count("*").cast("bigint").alias("n_occurrences"),
        )
    )
    return (
        src.groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .join(F.broadcast(fl), "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_flagged_docs"), F.lit(0))
            .cast("bigint")
            .alias("n_flagged_docs"),
            F.coalesce(F.col("n_leaked_spans"), F.lit(0))
            .cast("bigint")
            .alias("n_leaked_spans"),
            F.coalesce(F.col("n_occurrences"), F.lit(0))
            .cast("bigint")
            .alias("n_occurrences"),
            F.expr(
                "CAST(CAST(COALESCE(n_flagged_docs, 0) AS DECIMAL(38,0))"
                " * 1000000 DIV n_docs AS BIGINT)"
            ).alias("flagged_ppm"),
        )
        .orderBy("source")
    )


# q68's PII patterns, shared verbatim: Java regex and RE2 agree on
# both (no \s, no unicode classes). Counting runs on the RAW text (the
# scrub's sequencing — emails masked before digit runs — matters for
# rewriting, not for incidence: a >=6-digit run inside an email local
# part counts under both patterns in both engines identically).
PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"
PII_NUM_RE = r"\d{6,}"


@declared(
    "q196_pii_incidence",
    rf"""WITH m AS (
         SELECT source,
                COALESCE(len(regexp_extract_all(text,
                  '{PII_EMAIL_RE}')), 0) AS n_email,
                COALESCE(len(regexp_extract_all(text,
                  '\d{{6,}}')), 0) AS n_num
         FROM documents)
       SELECT source,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS docs_with_email,
              CAST(SUM(CASE WHEN n_num > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS docs_with_number,
              CAST(SUM(n_email) AS BIGINT) AS email_matches,
              CAST(SUM(n_num) AS BIGINT) AS number_matches,
              CAST(CAST(SUM(CASE WHEN n_email > 0 OR n_num > 0
                                 THEN 1 ELSE 0 END) AS HUGEINT)
                   * 1000000 // COUNT(*) AS BIGINT) AS pii_docs_ppm
       FROM m GROUP BY source ORDER BY source""",
)
def q196(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source PII incidence report (round 13): the measurement side
    of q68's scrub — per source: docs scanned, docs containing an
    email / a long digit run, total matches of each, and the ppm of
    docs carrying ANY PII. A compliance pipeline publishes exactly
    this table per ingest feed (and a post-scrub re-run of it proves
    the scrub worked: every count zero); q68 rewrites, this measures —
    the same find→apply→audit split as the decontam and mixture tiers.

    NULL contract: NULL text counts as zero matches (COALESCE on both
    engines); NULL-source docs keep their own group (single-table
    GROUP BY — no join for a NULL key to fall out of, and both engines
    retain the NULL group identically). doc identity is irrelevant to
    incidence, so NULL-doc_id rows are counted too.

    Plan shape at 100 TB: scan-local regexp counting (JVM-side
    regexp_count, codegen'd — no UDF) into one map-side-combinable
    hash aggregate over dozens of source groups. The cheapest shape a
    corpus-wide scan can have; e6 ratio through DECIMAL(38,0)/HUGEINT
    as everywhere (ADVICE r12)."""
    return _pii_report(T(spark, sf, "documents"), F.col("text"))


def _pii_report(d: DataFrame, text_col) -> DataFrame:
    """Shared q196/q199 aggregation: per-source PII incidence of
    ``text_col`` (raw text for q196, the q68-scrubbed rewrite for the
    q199 audit). One scan-local regexp-count projection into one
    map-side-combinable hash aggregate."""
    m = d.select(
        "source",
        F.coalesce(F.regexp_count(text_col, F.lit(PII_EMAIL_RE)), F.lit(0))
        .cast("bigint")
        .alias("n_email"),
        F.coalesce(F.regexp_count(text_col, F.lit(PII_NUM_RE)), F.lit(0))
        .cast("bigint")
        .alias("n_num"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("n_email") > 0).cast("bigint"))
            .cast("bigint")
            .alias("docs_with_email"),
            F.sum((F.col("n_num") > 0).cast("bigint"))
            .cast("bigint")
            .alias("docs_with_number"),
            F.sum("n_email").cast("bigint").alias("email_matches"),
            F.sum("n_num").cast("bigint").alias("number_matches"),
            F.sum(
                ((F.col("n_email") > 0) | (F.col("n_num") > 0)).cast("bigint")
            )
            .cast("bigint")
            .alias("pii_docs"),
        )
        .select(
            "source",
            "n_docs",
            "docs_with_email",
            "docs_with_number",
            "email_matches",
            "number_matches",
            F.expr(
                "CAST(CAST(pii_docs AS DECIMAL(38,0)) * 1000000"
                " DIV n_docs AS BIGINT)"
            ).alias("pii_docs_ppm"),
        )
        .orderBy("source")
    )


from iceberg_cache_spark.operators import text as _X  # noqa: E402
from iceberg_cache_spark.plans.extensions import _DUCK_PUNCT  # noqa: E402


@declared(
    "q197_shard_curriculum",
    f"""WITH base AS (
         SELECT doc_id, text, {_DUCK_TOKS.format(c='text')} AS t
         FROM documents WHERE doc_id IS NOT NULL),
       g AS (SELECT doc_id,
                    CAST(SUM(COALESCE(len(t), 0)) AS BIGINT) AS n_tokens
             FROM base GROUP BY doc_id),
       f AS (SELECT doc_id, n_tokens FROM g WHERE n_tokens > 0),
       c AS (SELECT doc_id, n_tokens,
                    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS start_off
             FROM f),
       e AS (SELECT doc_id, n_tokens, start_off, CAST(p AS BIGINT) AS pack_id
             FROM c,
                  UNNEST(range(start_off // {PACK_TOKENS},
                               (start_off + n_tokens - 1) // {PACK_TOKENS}
                               + 1)) AS u(p)),
       s AS (SELECT pack_id // {PACKS_PER_SHARD} AS shard_id, doc_id,
                    LEAST(start_off + n_tokens,
                          (pack_id + 1) * {PACK_TOKENS})
                    - GREATEST(start_off, pack_id * {PACK_TOKENS})
                      AS slice_len
             FROM e),
       pq AS (SELECT doc_id, text, t,
                     length(text) - length(regexp_replace(text,
                       '{_DUCK_PUNCT}', '', 'g')) AS n_punct
              FROM base),
       r AS (SELECT doc_id,
                CASE WHEN length(text) > 0
                     THEN n_punct / CAST(length(text) AS DOUBLE)
                     ELSE 0.0 END AS pr,
                CASE WHEN len(t) > 0
                     THEN len(list_filter(t, x -> list_contains(
                            ['the','and','of','to','is','in','that','it'],
                            x))) / CAST(len(t) AS DOUBLE)
                     ELSE 0.0 END AS sr,
                length(text) AS nc
             FROM pq),
       caps AS (SELECT doc_id,
                CAST(nc AS DECIMAL(12,3)) * CAST(0.002 AS DECIMAL(4,3))
                  AS lens,
                CAST(pr AS DECIMAL(18,12)) * 4 AS p4,
                CAST(sr AS DECIMAL(18,12)) * 5 AS s5
             FROM r),
       qual AS (SELECT doc_id, CAST(ROUND(
                CAST(0.4 AS DECIMAL(2,1)) *
                  (CASE WHEN lens < 1 THEN lens
                        ELSE CAST(1.0 AS DECIMAL(12,6)) END)
              + CAST(0.3 AS DECIMAL(2,1)) *
                  (CAST(1.0 AS DECIMAL(2,1))
                   - CASE WHEN p4 < 1 THEN p4
                          ELSE CAST(1.0 AS DECIMAL(18,12)) END)
              + CAST(0.3 AS DECIMAL(2,1)) *
                  (CASE WHEN s5 < 1 THEN s5
                        ELSE CAST(1.0 AS DECIMAL(18,12)) END),
                4) * 10000 AS BIGINT) AS q_e4
             FROM caps),
       j AS (SELECT s.shard_id, s.doc_id, s.slice_len, q.q_e4
             FROM s JOIN qual q ON q.doc_id = s.doc_id),
       agg AS (SELECT CAST(shard_id AS BIGINT) AS shard_id,
                      CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                      CAST(SUM(slice_len) AS BIGINT) AS tokens_filled,
                      CAST(SUM(CAST(q_e4 AS HUGEINT) * slice_len)
                           // SUM(slice_len) AS BIGINT) AS mean_quality_e4
               FROM j GROUP BY shard_id)
       SELECT shard_id, n_docs, tokens_filled, mean_quality_e4,
              CAST(ROW_NUMBER() OVER (ORDER BY mean_quality_e4 DESC,
                                      shard_id) AS BIGINT)
                AS curriculum_rank
       FROM agg ORDER BY shard_id""",
)
def q197(spark: SparkSession, sf: str) -> DataFrame:
    """Shard CURRICULUM ordering (round 13): cross-tier composition of
    the packing and quality tiers — per training shard (q189's unit of
    loader work), the token-weighted mean document quality in exact e4
    fixed point, and the shard's rank in an easiest-first curriculum
    (highest mean quality = rank 1, shard_id tiebreak). Curriculum
    schedules (quality- or difficulty-ordered data presentation) are a
    standard pretraining lever; the scheduler consumes exactly this
    table — shard -> rank — without touching the corpus again.

    Determinism: the weighted mean is SUM(q_e4 * slice_len) DIV
    SUM(slice_len) in pure integers (quality_score_e4 — the rounded
    DECIMAL x10000, exact), because a token-weighted DOUBLE mean over
    millions of docs per shard is association-order-dependent and
    would flake the value hash between a 1000-executor sum tree and
    the oracle's sequential one. 128-bit intermediates for the
    products (DECIMAL(38,0)/HUGEINT, the ADVICE r12 proofing).

    Plan shape at 100 TB: the manifest side is the shared q184
    two-level prefix sum + map-side slab explode; the quality side is
    scan-local DECIMAL arithmetic on documents (no UDF); they meet in
    ONE equi-join on doc_id (co-partitioned shuffle — both sides hash
    by doc_id), then a hash aggregate to n_shards rows. The rank
    window runs over the aggregated shards frame only (thousands of
    rows at 100 TB — one task, deliberately: ranking is global by
    definition and the frame is tiny)."""
    mf = _pack_manifest(spark, sf).select(
        F.expr(f"CAST(pack_id DIV {PACKS_PER_SHARD} AS BIGINT)").alias(
            "shard_id"
        ),
        "doc_id",
        "slice_len",
    )
    # tokens staged once (round 14): quality_score_e4's stopword ratio
    # references the tokenizer 3× and Catalyst inlines single-reference
    # aliases — see q66.
    qual = (
        T(spark, sf, "documents")
        .where(F.col("doc_id").isNotNull())
        .select("doc_id", "text", _X.tokens(F.col("text")).alias("_tk"))
        .select(
            "doc_id",
            _X.quality_score_e4(F.col("text"), toks=F.col("_tk")).alias("q_e4"),
        )
    )
    agg = (
        mf.join(qual, "doc_id")
        .groupBy("shard_id")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum("slice_len").cast("bigint").alias("tokens_filled"),
            F.expr(
                "CAST(SUM(CAST(q_e4 AS DECIMAL(38,0)) * slice_len)"
                " DIV SUM(slice_len) AS BIGINT)"
            ).alias("mean_quality_e4"),
        )
    )
    w = W.orderBy(F.col("mean_quality_e4").desc(), "shard_id")
    return agg.select(
        "shard_id",
        "n_docs",
        "tokens_filled",
        "mean_quality_e4",
        F.row_number().over(w).cast("bigint").alias("curriculum_rank"),
    ).orderBy("shard_id")


from iceberg_cache_spark.plans.extensions import (  # noqa: E402
    CC_LABELS_CTE as _PAIR_CTE,
)


@declared(
    "q198_source_overlap_matrix",
    _PAIR_CTE
    + """,
       src AS (SELECT doc_id, source FROM documents
               WHERE doc_id IS NOT NULL AND source IS NOT NULL),
       m AS (SELECT LEAST(sa.source, sb.source) AS source_a,
                    GREATEST(sa.source, sb.source) AS source_b
             FROM pairs p
             JOIN src sa ON sa.doc_id = p.id_a
             JOIN src sb ON sb.doc_id = p.id_b)
       SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
       FROM m GROUP BY source_a, source_b ORDER BY source_a, source_b""",
)
def q198(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-SOURCE duplication matrix (round 13): the provenance view
    of the near-dup pair graph — per unordered source pair (canonical
    LEAST/GREATEST order so (A,B) and (B,A) collapse), how many exact
    n-gram-Jaccard >= 0.5 duplicate pairs have one endpoint in each.
    The diagonal (source_a = source_b) is intra-feed redundancy; the
    off-diagonal is CROSS-FEED mirroring — the signal a mixture
    planner (q190) and an ingest owner both need: two crawls of the
    same site look like two sources until this table shows one
    re-serving the other's documents.

    Contracts: pair endpoints with a NULL source drop (no feed to
    attribute — the q195 contract); NULL-doc_id docs never enter the
    pair graph. LEAST/GREATEST on VARCHAR is portable (the DuckDB
    decimal-widening trap is decimal-only).

    Plan shape at 100 TB: the pair graph is the session-cached
    inverted-index join output (plans/shared.ngram_pair_graph —
    shared with q116/q148/q193; built once per session), typically a
    few percent of the corpus in rows; it joins doc->source twice on
    doc_id as the SMALL side (AQE broadcasts it against the corpus
    doc list) and aggregates to a sources x sources frame — dozens of
    rows. No new corpus-sized shuffle."""
    from iceberg_cache_spark.plans.shared import ngram_pair_graph

    src = (
        T(spark, sf, "documents")
        .where(F.col("doc_id").isNotNull() & F.col("source").isNotNull())
        .select("doc_id", "source")
    )
    pairs = ngram_pair_graph(spark, sf)
    m = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("sb")
            ),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    return (
        m.groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


@declared(
    "q199_pii_scrub_audit",
    rf"""WITH scrubbed AS (
         SELECT source,
                regexp_replace(regexp_replace(text,
                  '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                  '\d{{6,}}', '<NUM>', 'g') AS text
         FROM documents),
       m AS (
         SELECT source,
                COALESCE(len(regexp_extract_all(text,
                  '{PII_EMAIL_RE}')), 0) AS n_email,
                COALESCE(len(regexp_extract_all(text,
                  '\d{{6,}}')), 0) AS n_num
         FROM scrubbed)
       SELECT source,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS docs_with_email,
              CAST(SUM(CASE WHEN n_num > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS docs_with_number,
              CAST(SUM(n_email) AS BIGINT) AS email_matches,
              CAST(SUM(n_num) AS BIGINT) AS number_matches,
              CAST(CAST(SUM(CASE WHEN n_email > 0 OR n_num > 0
                                 THEN 1 ELSE 0 END) AS HUGEINT)
                   * 1000000 // COUNT(*) AS BIGINT) AS pii_docs_ppm
       FROM m GROUP BY source ORDER BY source""",
)
def q199(spark: SparkSession, sf: str) -> DataFrame:
    """Post-scrub PII AUDIT (round 13): q196's incidence report run
    over q68's SCRUBBED text — the apply-side proof that closes the
    PII tier's find (q196) → apply (q68) → AUDIT chain the way q193
    closes the split tier and q194 the mixture tier. Every match
    column must read zero: the email mask leaves no '@'-bearing token
    and the digit mask leaves only sub-threshold runs, and because
    the replacement literals contain neither '@' nor digits, masking
    cannot CREATE a new match by adjacency (pytest pins the
    from-first-principles cases; this query proves it corpus-wide on
    both engines). n_docs stays the real per-source count, so a green
    row is a measured all-clear, not a vacuous empty result.

    Plan shape: identical to q196 (scan-local regexp rewrite + count,
    one hash aggregate) — the scrub adds two JVM regexp_replace
    passes to the projection, still zero-shuffle."""
    d = T(spark, sf, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), PII_EMAIL_RE, "<EMAIL>"),
        PII_NUM_RE,
        "<NUM>",
    )
    return _pii_report(d, scrubbed)


@declared(
    "q200_dedup_apply_audit",
    _PAIR_CTE
    + """,
       alldocs AS (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL),
       dropped AS (SELECT doc_id FROM labels WHERE doc_id <> cluster_id),
       surv AS (SELECT a.doc_id FROM alldocs a
                LEFT JOIN dropped dr ON dr.doc_id = a.doc_id
                WHERE dr.doc_id IS NULL),
       viol AS (SELECT CAST(COUNT(*) AS BIGINT) AS surviving_dup_pairs
                FROM pairs p
                JOIN surv s1 ON s1.doc_id = p.id_a
                JOIN surv s2 ON s2.doc_id = p.id_b)
       SELECT CAST((SELECT COUNT(*) FROM alldocs) AS BIGINT) AS n_docs,
              CAST((SELECT COUNT(*) FROM surv) AS BIGINT) AS n_kept,
              CAST((SELECT COUNT(*) FROM dropped) AS BIGINT) AS n_dropped,
              surviving_dup_pairs
       FROM viol""",
)
def q200(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup-apply AUDIT (round 13): the verification step that makes
    q150's kill decision a measured fact — re-probe the raw duplicate
    PAIR graph against the survivor set and count pairs whose BOTH
    endpoints survived the keep-min-representative apply. Zero by
    construction (every cluster keeps exactly its min-id member, and
    every pair's endpoints share a cluster), and this query proves it
    from the EDGES, not from the labels the apply used — the same
    audit-the-output-against-the-input discipline as q193 (split
    tier), q194 (mixture) and q199 (PII). Also reports corpus /
    kept / dropped totals so the all-clear row is non-vacuous.

    Plan shape at 100 TB: pair graph and CC labels are the session's
    derived cache entries (built once, shared with q116/q148/q150/
    q158/q193); dropped ids are a small fraction of the corpus; the
    audit is two equi-joins of the (sparse) pair list against the
    survivor id list plus four 1-row aggregates crossJoined as
    broadcast singletons. Never a corpus self-join."""
    from iceberg_cache_spark.plans.shared import (
        ngram_cc_labels,
        ngram_pair_graph,
    )

    d = (
        T(spark, sf, "documents")
        .where(F.col("doc_id").isNotNull())
        .select("doc_id")
    )
    labels = ngram_cc_labels(spark, sf)
    dropped = labels.filter(F.col("id") != F.col("cid")).select(
        F.col("id").alias("doc_id")
    )
    surv = d.join(dropped, "doc_id", "left_anti")
    pairs = ngram_pair_graph(spark, sf)
    viol = (
        pairs.join(surv.select(F.col("doc_id").alias("id_a")), "id_a")
        .join(surv.select(F.col("doc_id").alias("id_b")), "id_b")
        .agg(F.count("*").cast("bigint").alias("surviving_dup_pairs"))
    )
    nd = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    nk = surv.agg(F.count("*").cast("bigint").alias("n_kept"))
    ndr = dropped.agg(F.count("*").cast("bigint").alias("n_dropped"))
    return (
        nd.crossJoin(F.broadcast(nk))
        .crossJoin(F.broadcast(ndr))
        .crossJoin(F.broadcast(viol))
        .select("n_docs", "n_kept", "n_dropped", "surviving_dup_pairs")
    )
