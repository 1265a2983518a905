"""Distributed connected components (functions/graph.py) vs union-find."""

import random

import pyarrow as pa

from anycrawl_ray.functions.graph import connected_components

SF = "/root/testdata/sf0.001"


def uf_labels(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def edge_table(edges):
    return pa.table(
        {"a_id": pa.array([e[0] for e in edges], pa.int64()),
         "b_id": pa.array([e[1] for e in edges], pa.int64())}
    )


def check(edges, n_shards=4):
    out = connected_components(edge_table(edges), n_shards=n_shards)
    got = dict(zip(out.column("node").to_pylist(),
                   out.column("component").to_pylist()))
    nodes = sorted({x for e in edges for x in e})
    assert got == uf_labels(edges, nodes)
    return got


def test_cc_random_graph(ray_session):
    rng = random.Random(11)
    nodes = list(range(0, 500, 2))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(220)]
    edges = [(a, b) for a, b in edges if a != b]
    check(edges)


def test_cc_path_and_cliques(ray_session):
    """Adversarial diameter (a 40-node path) + dense cliques + singleton
    pairs, across shard counts."""
    path = list(range(100, 140))
    edges = list(zip(path, path[1:]))
    for base in (1000, 2000):
        clique = list(range(base, base + 8))
        edges += [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
    edges += [(7, 9), (5000, 5001)]
    got = check(edges, n_shards=3)
    assert got[139] == 100               # far end of the path
    assert got[1007] == 1000 and got[2007] == 2000
    assert got[9] == 7 and got[5001] == 5000


def test_cc_empty_and_single(ray_session):
    out = connected_components(edge_table([]))
    assert out.num_rows == 0
    got = check([(42, 7)], n_shards=2)
    assert got == {7: 7, 42: 7}


def test_cc_matches_driver_union_find_on_minhash_pairs(ray_session):
    """The scale path and q_dedup_keep_best's driver union-find agree on the
    real near-dup graph of the sf0.001 corpus."""
    from anycrawl_ray import queries as q

    pairs = q.q_minhash_dedup(SF)
    edges = list(zip(pairs.column("a_id").to_pylist(),
                     pairs.column("b_id").to_pylist()))
    assert edges, "sf0.001 corpus should have near-dup pairs"
    got = check(edges)
    # cluster roots equal q_dedup_keep_best's cluster_id set
    keep = q.q_dedup_keep_best(SF)
    assert set(keep.column("cluster_id").to_pylist()) == set(got.values())
