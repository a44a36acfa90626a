"""kcore_bipartite vs a brute-force peel on a planted graph, including the
convergence flag and the fixed-round prefix semantics."""

import pyarrow as pa
import pytest


def _brute_kcore(edges, k):
    cur = list(edges)
    while True:
        da, db = {}, {}
        for a, b in cur:
            da[a] = da.get(a, 0) + 1
            db[b] = db.get(b, 0) + 1
        nxt = [(a, b) for a, b in cur if da[a] >= k and db[b] >= k]
        if len(nxt) == len(cur):
            return cur
        cur = nxt


def _planted_edges():
    # a dense bipartite block (every a in 0..3 × every b in 0..3) that
    # survives k=3, plus a cascade: a10 touches two dense-side b nodes and
    # one pendant b10. Round 1 peels (a10,b10) (b10 degree 1); that drops
    # a10 to degree 2, so round 2 peels a10's remaining edges — the
    # fixpoint needs TWO peel rounds.
    dense = [(a, b) for a in range(4) for b in range(4)]
    cascade = [(10, 0), (10, 1), (10, 10)]
    return dense + cascade


def _as_ds(edges):
    import ray.data

    t = pa.table({"key_a": pa.array([a for a, _ in edges], pa.int64()),
                  "key_b": pa.array([b for _, b in edges], pa.int64())})
    return ray.data.from_arrow(t)


@pytest.mark.usefixtures("ray_session")
def test_kcore_matches_brute_force_and_converges():
    from jsonschema_validator_ray.stages.components import kcore_bipartite

    edges = _planted_edges()
    core, converged = kcore_bipartite(_as_ds(edges), k=3, rounds=4)
    got = sorted(map(tuple, core.to_pandas()[["key_a", "key_b"]]
                     .to_numpy().tolist()))
    assert got == sorted(_brute_kcore(edges, 3))
    assert converged


@pytest.mark.usefixtures("ray_session")
def test_kcore_reports_unconverged_when_rounds_run_out():
    from jsonschema_validator_ray.stages.components import kcore_bipartite

    edges = _planted_edges()
    core, converged = kcore_bipartite(_as_ds(edges), k=3, rounds=1)
    df = core.to_pandas()
    # exactly the pendant edge peeled; a10 still lingers at degree 2
    assert len(df) == len(edges) - 1
    assert not converged
