"""Round-3 curation-tier operators: connected-components dedup
clusters, Gopher quality rules, boilerplate-gram stats, domain
reweighting. The declared queries (q116–q119) are oracle-gated in
test_correctness.py / verify_contract; these tests pin the operator
semantics on planted fixtures where the right answer is computable by
hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_cache_spark.operators.curation import domain_reweight
from iceberg_cache_spark.operators.dedup import (
    boilerplate_gram_stats,
    connected_components,
    connected_components_star,
)
from iceberg_cache_spark.operators.text import gopher_metrics


# -- connected components ------------------------------------------------


def test_components_transitive_chain(spark):
    # chain 1-2-3-4 plus isolated pair 10-11: transitivity must pull
    # 4 into cluster 1 even though (1,4) is not an edge.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        (r.id, r.cid) for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_components_edge_direction_irrelevant(spark):
    # min id appears on the RIGHT of every pair: labels must still
    # flood backwards through the undirected edge list.
    pairs = spark.createDataFrame([(5, 1), (9, 5)], ["id_a", "id_b"])
    got = {(r.id, r.cid) for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (5, 1), (9, 1)}


def test_components_converge_on_long_chain(spark):
    # a 12-node path is the worst diameter-to-size shape; must converge
    # within the default iteration budget.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    rows = connected_components(pairs).collect()
    assert {r.cid for r in rows} == {0}
    assert len(rows) == 13


def test_components_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(pairs).count() == 0


def test_components_nonconvergence_raises(spark):
    # 26-node path (diameter 25 > default max_iter budget of 5 here):
    # exhausting the budget must be LOUD, not a silently-partial closure.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=5)


def test_components_nonconvergence_flag_mode(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], ["id_a", "id_b"]
    )
    rows = connected_components(pairs, max_iter=5, on_nonconverged="flag").collect()
    assert all(r.converged is False for r in rows)
    # with enough iterations the same graph converges and flags true
    rows = connected_components(pairs, max_iter=30, on_nonconverged="flag").collect()
    assert all(r.converged is True for r in rows)
    assert {r.cid for r in rows} == {0}


def test_components_star_matches_minlabel(spark):
    """Large-star/small-star contraction must produce the identical
    (id, min-id) labeling as min-label propagation on every graph
    shape: chains (transitivity), reversed edges, disjoint pairs, and
    a random multigraph."""
    import random

    cases = [
        [(1, 2), (2, 3), (3, 4), (10, 11)],
        [(5, 1), (9, 5)],
        [(i, i + 1) for i in range(0, 200, 2)],
    ]
    rnd = random.Random(7)
    cases.append(
        [
            (a, b)
            for a, b in (
                (rnd.randrange(300), rnd.randrange(300)) for _ in range(250)
            )
            if a != b
        ]
    )
    for edges in cases:
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        ml = {
            (r.id, r.cid)
            for r in connected_components(pairs, max_iter=60).collect()
        }
        st = {(r.id, r.cid) for r in connected_components_star(pairs).collect()}
        assert ml == st


def test_components_star_diameter_independent(spark):
    # the 25-hop path needs >25 min-label rounds but converges well
    # inside star contraction's default budget (O(log^2 n) rounds)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], ["id_a", "id_b"]
    )
    rows = connected_components_star(pairs).collect()
    assert {r.cid for r in rows} == {0}
    assert len(rows) == 26


def test_components_long_path_converges_with_budget(spark):
    # the >20-hop shape from the round-3 verdict: default budget is NOT
    # enough for a 25-hop path, but an explicit max_iter closes it.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], ["id_a", "id_b"]
    )
    rows = connected_components(pairs, max_iter=30).collect()
    assert {r.cid for r in rows} == {0}
    assert len(rows) == 26


# -- gopher metrics -------------------------------------------------------


def test_gopher_rules_on_planted_docs(spark):
    # 60 distinct 6-char words: mean word length lands inside [3, 10]
    filler = " ".join(f"word{i:02d}" for i in range(60))
    docs = spark.createDataFrame(
        [
            # 62 words, stopwords present, no dominant word -> passes
            (1, "the and " + filler),
            # too short
            (2, "the and tiny doc"),
            # dominant word: 'spam' is >20% of words
            (3, "the and " + "spam " * 30 + filler),
            # no stopwords
            (4, filler),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in gopher_metrics(docs).collect()}
    assert rows[1].passes == 1
    assert rows[2].word_count_ok == 0 and rows[2].passes == 0
    assert rows[3].repetition_ok == 0 and rows[3].passes == 0
    assert rows[4].stopword_ok == 0 and rows[4].passes == 0
    # integer metrics are exact
    assert rows[1].n_words == 62
    assert rows[1].n_stopwords == 2


# -- boilerplate grams ----------------------------------------------------


def test_boilerplate_gram_counts(spark):
    shared = "alpha beta gamma delta"  # 3-grams shared by docs 1,2
    docs = spark.createDataFrame(
        [
            (1, shared + " one two three"),
            (2, shared + " four five six"),
            (3, "seven eight nine ten eleven"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in boilerplate_gram_stats(docs).collect()}
    # docs 1 and 2 share exactly the 2 grams inside "alpha beta gamma
    # delta"; doc 3 shares nothing.
    assert rows[1].n_boiler == 2 and rows[2].n_boiler == 2
    assert rows[3].n_boiler == 0
    assert rows[1].n_grams == 5  # 7 tokens -> 5 distinct 3-grams


def test_boilerplate_plan_broadcasts_boiler_set(spark, sf_dir):
    from iceberg_cache_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = (
        boilerplate_gram_stats(d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan


# -- domain reweighting ---------------------------------------------------


def test_domain_reweight_uniform_mix(spark):
    # source A has 4x the tokens of B: A must be downsampled toward the
    # uniform target, B kept whole.
    rows = []
    for i in range(40):
        rows.append((i, "A", "tok " * 10))
    for i in range(40, 50):
        rows.append((i, "B", "tok " * 10))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {r.source: r for r in domain_reweight(df).collect()}
    # total=500, n_src=2, target=250; A: 1000*250 div 400 = 625
    assert got["A"].permille == 625
    assert got["B"].permille == 1000
    assert got["B"].kept_docs == 10
    # survivors of A: doc_id % 1000 < 625 -> ids 0..39 all < 625 -> all
    # kept in this toy id space (the rate binds only on larger spaces)
    assert got["A"].kept_docs == 40
    assert got["A"].src_tokens == 400


def test_domain_reweight_never_upsamples(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", "a b c") for i in range(30)],
        ["doc_id", "source", "text"],
    )
    for r in domain_reweight(df).collect():
        assert r.permille <= 1000
        assert r.kept_docs <= 10


# -- connected components: property test vs union-find --------------------


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, then label = min member of the set
    roots: dict[int, list[int]] = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for r, members in roots.items() for n in members}


def test_components_match_union_find_on_random_graphs(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    edge = st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda e: e[0] != e[1])

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(edges=st.lists(edge, min_size=1, max_size=25))
    def check(edges):
        from iceberg_cache_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        got = {r.id: r.cid for r in connected_components(pairs).collect()}
        assert got == _union_find_components(edges)

    check()


# -- incremental (batch-vs-corpus) dedup ---------------------------------


def test_incremental_dedup_flags_planted(spark):
    from iceberg_cache_spark.operators.dedup import incremental_dedup_flags

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    near = base.replace("epsilon", "EPSILON2").replace("tau", "TAU2")
    corpus = spark.createDataFrame(
        [(1, base), (2, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, base),        # exact copy of corpus doc 1 (=> near too)
            (11, near),        # perturbed copy: near only
            (12, "completely different words nothing shared here at all ok"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.exact_dup, r.near_dup)
        for r in incremental_dedup_flags(corpus, batch).collect()
    }
    assert got[10] == (1, 1)
    assert got[11] == (0, 1)
    assert got[12] == (0, 0)
    assert set(got) == {10, 11, 12}  # corpus docs never appear in output


def test_incremental_dedup_empty_batch(spark):
    from iceberg_cache_spark.operators.dedup import incremental_dedup_flags

    corpus = spark.createDataFrame([(1, "a b c d e f g")], ["doc_id", "text"])
    batch = spark.createDataFrame([], "doc_id bigint, text string")
    assert incremental_dedup_flags(corpus, batch).count() == 0
