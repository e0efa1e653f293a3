"""connected_components (large-star/small-star) vs union-find."""

import numpy as np
import pytest

from tokcodec.graph import connected_components


def _uf(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min of component
    return {x: find(x) for x in parent}


def _run(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)],
        "src long, dst long",
    )
    got = {
        r.node: r.component
        for r in connected_components(df).collect()
    }
    return got


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = np.random.default_rng(seed)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 150, size=(120, 2))
        if a != b
    ]
    want = _uf(edges)
    got = _run(spark, edges)
    assert got == want


def test_long_chain_converges(spark):
    # a 64-node path: fixed 5-round propagation would NOT finish this;
    # the star algorithm must (in O(log n)-ish rounds)
    edges = [(i, i + 1) for i in range(63)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(64)}


def test_disjoint_cliques_and_self_loops(spark):
    edges = (
        [(a, b) for a in range(4) for b in range(4) if a < b]
        + [(10, 10), (10, 11)]
        + [(20, 21)]
    )
    got = _run(spark, edges)
    assert got == {
        **{i: 0 for i in range(4)},
        10: 10, 11: 10, 20: 20, 21: 20,
    }
