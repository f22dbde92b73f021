"""Connected-components correctness: property-based vs pure-Python union-find
(SURVEY.md §5.2 item 4)."""

import pytest
from hypothesis import given, settings, strategies as st

from tcmkg.oracle.extractor import _UnionFind


def _uf_components(pairs):
    uf = _UnionFind()
    nodes = set()
    for n, k in pairs:
        nodes.add(n)
        uf.union(f"n:{n}", f"k:{k}")
    return {n: uf.find(f"n:{n}") for n in nodes}


def _group(labels: dict) -> set[frozenset]:
    from collections import defaultdict

    g = defaultdict(set)
    for n, c in labels.items():
        g[c].add(n)
    return {frozenset(v) for v in g.values()}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 12)),
        min_size=1, max_size=120,
    )
)
def test_cc_matches_union_find(spark, pairs):
    from tcmkg.pipeline.cc import connected_components

    inc = spark.createDataFrame(
        [(f"n{n:03d}", f"k{k:03d}") for n, k in pairs], "node string, key string"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(inc).collect()
    }
    want = _uf_components([(f"n{n:03d}", f"k{k:03d}") for n, k in pairs])
    # same grouping
    assert _group(got) == _group(want)
    # representative = min node id of the component (determinism contract)
    for n, c in got.items():
        assert c == min(_g for _g in got if got[_g] == c)


def test_cc_chain_and_hot_key(spark):
    """Chain A-B-C-D through distinct keys + one hot key shared by many."""
    from tcmkg.pipeline.cc import connected_components

    rows = [("a", "k1"), ("b", "k1"), ("b", "k2"), ("c", "k2"), ("c", "k3"), ("d", "k3")]
    rows += [(f"z{i:04d}", "hot") for i in range(500)]
    inc = spark.createDataFrame(rows, "node string, key string")
    got = {r["node"]: r["component"] for r in connected_components(inc).collect()}
    assert got["a"] == got["b"] == got["c"] == got["d"] == "a"
    assert got["z0499"] == "z0000"
    assert len(got) == 504


def test_stable_rank(spark):
    from tcmkg.pipeline.util import stable_rank

    vals = [f"v{i:05d}" for i in range(999)]
    df = spark.createDataFrame([(v,) for v in reversed(vals)], "x string")
    got = {r["x"]: r["rank"] for r in stable_rank(df, "x", num_partitions=7).collect()}
    assert got == {v: i for i, v in enumerate(vals)}


def test_salted_distinct_count(spark):
    from tcmkg.pipeline.util import salted_distinct_count

    rows = [("a", i % 5) for i in range(100)] + [("b", i) for i in range(7)]
    df = spark.createDataFrame(rows, "k string, v int")
    got = {r["k"]: r["n_distinct"] for r in salted_distinct_count(df, ["k"], "v").collect()}
    assert got == {"a": 5, "b": 7}


def test_cc_medium_scale(spark):
    """A 60k-node / 75k-incidence graph with long chains and a giant skewed
    component: converges, deterministic min-representatives, sane runtime."""
    from tcmkg.pipeline.cc import connected_components

    rows = []
    # 5k chain components of length 10 (diameter stress)
    for comp in range(5000):
        for j in range(9):
            rows.append((f"n{comp:05d}_{j:02d}", f"k{comp:05d}_{j:02d}"))
            rows.append((f"n{comp:05d}_{j+1:02d}", f"k{comp:05d}_{j:02d}"))
    # one giant skewed component: 10k nodes on one hot key
    rows += [(f"hot{i:05d}", "HOTKEY") for i in range(10000)]
    inc = spark.createDataFrame(rows, "node string, key string")
    got = connected_components(inc, max_iter=30)
    comps = {r["node"]: r["component"] for r in got.collect()}
    assert comps["hot09999"] == "hot00000"
    assert comps["n00042_09"] == "n00042_00"
    assert len({c for n, c in comps.items() if n.startswith("n")}) == 5000


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=100,
    )
)
def test_cc_edges_matches_union_find(spark, pairs):
    """r6 pair-edge fast path: same components + same min-id representative
    as a pure-Python union-find, on arbitrary edge lists (self-loops and
    duplicate/reversed edges included by generation)."""
    from tcmkg.pipeline.cc import connected_components_edges

    edges = spark.createDataFrame(
        [(f"n{a:03d}", f"n{b:03d}") for a, b in pairs], "a string, b string"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components_edges(edges).collect()
    }
    uf = _UnionFind()
    nodes = set()
    for a, b in pairs:
        nodes.add(f"n{a:03d}"); nodes.add(f"n{b:03d}")
        uf.union(f"n{a:03d}", f"n{b:03d}")
    want = {n: uf.find(n) for n in nodes}
    assert _group(got) == _group(want)
    for n, c in got.items():
        assert c == min(_g for _g in got if got[_g] == c)


def test_cc_edges_pre_checkpointed_identical(spark):
    """r6: `pre_checkpointed=True` (the dedup chain's path — its tagged
    edge union is already a checkpoint leaf) skips only the input
    re-materialization action; labels and representatives are identical
    to the default path."""
    from tcmkg.pipeline.cc import connected_components_edges

    rows = [(f"n{a:03d}", f"n{b:03d}") for a, b in
            [(0, 1), (1, 2), (5, 6), (6, 7), (7, 5), (9, 9)]]
    edges = spark.createDataFrame(rows, "a string, b string").localCheckpoint()
    base = {
        r["node"]: r["component"]
        for r in connected_components_edges(edges).collect()
    }
    fast = {
        r["node"]: r["component"]
        for r in connected_components_edges(edges, pre_checkpointed=True).collect()
    }
    assert base == fast and set(fast.values()) == {"n000", "n005", "n009"}


def test_cc_edges_label_hooks(spark):
    """r6 hook acceleration: hooks connect a node to its current label —
    always intra-component — so the fixpoint is identical to the unhooked
    propagation wherever both converge, and a diameter-60 chain (which
    the unhooked form cannot finish inside the default max_iter=25)
    converges to the single true component."""
    import warnings

    from tcmkg.pipeline.cc import connected_components_edges

    edges = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in [(0, 1), (1, 2), (2, 3), (7, 8), (8, 9)]],
        "a string, b string",
    )
    plain = {r["node"]: r["component"]
             for r in connected_components_edges(edges, hook_labels=False).collect()}
    hooked = {r["node"]: r["component"]
              for r in connected_components_edges(edges, hook_labels=True).collect()}
    assert plain == hooked

    chain = spark.createDataFrame(
        [(f"n{i:05d}", f"n{i + 1:05d}") for i in range(60)], "a string, b string"
    )
    with warnings.catch_warnings():
        # only the non-convergence warning is the failure signal; other
        # library warnings during collect() must not fail the test
        warnings.filterwarnings("error", message=".*did not converge.*")
        got = {r["node"]: r["component"]
               for r in connected_components_edges(chain).collect()}
    assert set(got.values()) == {"n00000"} and len(got) == 61


def test_cc_edges_long_chain_block_boundary(spark):
    """A diameter-long chain crossing several 3-round blocks: the
    block-boundary convergence check (label monotone, stationary) must not
    stop early, and the converged label is the chain minimum."""
    from tcmkg.pipeline.cc import connected_components_edges

    n = 14  # diameter 13 > 4 blocks of 3 rounds
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)], "a string, b string"
    )
    got = {r["node"]: r["component"] for r in connected_components_edges(edges).collect()}
    assert set(got.values()) == {"n00"}
    assert len(got) == n + 1
