"""connected_components vs a driver-side union-find reference on random
graphs (seeded), plus the assign_components keep/drop contract."""

import random

import pytest
from pyspark.sql import functions as F

from receipt_scanner_spark.operators.dedup import assign_components, connected_components


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component = min node id reachable
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, min([n for n in range(n_nodes) if find(n) == r]))
    return {x: comp[find(x)] for x in range(n_nodes)}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (1, 30, 15),    # sparse: many singleton-ish clusters
    (2, 40, 60),    # dense: one giant component likely
    (3, 25, 24),    # chain-heavy
    (4, 50, 5),     # mostly isolated
])
def test_connected_components_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)]
    edges = [(u, v) for u, v in edges if u != v]
    expected = _union_find_components(n_nodes, edges)
    # restrict expectation to nodes that appear in an edge (operator contract)
    in_graph = {u for e in edges for u in e}
    edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        return
    got = {
        r["node"]: r["component"]
        for r in connected_components(edf).collect()
    }
    assert set(got) == in_graph
    for node in in_graph:
        assert got[node] == expected[node], (seed, node)


def test_chain_collapses_to_single_component(spark):
    # worst-case topology for naive propagation: a 64-node path
    edges = [(i, i + 1) for i in range(63)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(edf).collect()
    assert {r["component"] for r in got} == {0}
    assert {r["node"] for r in got} == set(range(64))


def test_assign_components_keep_flags(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in assign_components(docs, pairs).collect()}
    assert [rows[i]["component"] for i in range(6)] == [0, 0, 0, 3, 4, 4]
    assert [rows[i]["keep"] for i in range(6)] == [True, False, False, True, True, False]
