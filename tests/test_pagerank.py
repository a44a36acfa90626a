"""stages/pagerank — exact-integer PageRank vs a numpy int reference."""

import numpy as np
import pandas as pd

import ray.data

from jsonschema_validator_ray.stages.pagerank import pagerank


def _brute(edges, iterations=3, base=1_000_000, num=85, den=100):
    nodes = sorted({s for s, _ in edges})
    assert {d for _, d in edges} <= set(nodes), "dangling node in test graph"
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    rank = {n: base for n in nodes}
    teleport = ((den - num) * base) // den
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += rank[u] // deg[u]
        rank = {n: teleport + (num * s[n]) // den for n in nodes}
    return rank


def test_pagerank_matches_integer_reference(ray_session):
    rng = np.random.default_rng(17)
    # random undirected graph (symmetric edges → no dangling nodes)
    und = {(int(a), int(b))
           for a, b in rng.integers(0, 30, size=(120, 2)) if a != b}
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    out = pagerank(ds, "src", "dst", iterations=3, num_buckets=4).to_pandas()
    got = dict(zip(out["node"].astype(int), out["rank"].astype(int)))
    assert got == _brute(edges)


def test_pagerank_parallel_edges_and_star(ray_session):
    # parallel edges count twice; star center accumulates leaf mass
    edges = [("a", "b"), ("a", "b"), ("b", "a"),
             ("c", "a"), ("a", "c")]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    out = pagerank(ds, "src", "dst", iterations=2, num_buckets=2).to_pandas()
    got = dict(zip(out["node"], out["rank"].astype(int)))
    assert got == _brute(edges, iterations=2)
