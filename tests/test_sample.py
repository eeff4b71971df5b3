import os

import numpy as np
import jax
import jax.numpy as jnp

from pathnet_tpu.data import Graph, DeviceGraph
from pathnet_tpu.sample import (
    AliasSampler,
    PathSampler,
    bfs_distance_table,
    bfs_distance_table_host,
    sample_paths,
)
from pathnet_tpu.sample.alias import CdfSampler

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "edge_input")


def _line_graph(k=5):
    """0-1-2-...-k-1 path graph, uniform probs."""
    src = np.array([i for i in range(k - 1)] + [i + 1 for i in range(k - 1)], np.int32)
    dst = np.array([i + 1 for i in range(k - 1)] + [i for i in range(k - 1)], np.int32)
    return Graph(n=k, src=src, dst=dst, prob=np.ones(len(src)))


def test_alias_empirical_distribution():
    """Alias rolls reproduce the target transition distribution."""
    g = Graph(n=3,
              src=np.array([0, 0, 0, 1, 2], np.int32),
              dst=np.array([0, 1, 2, 0, 0], np.int32),
              prob=np.array([0.6, 0.3, 0.1, 1.0, 1.0]))
    dg = DeviceGraph.from_graph(g)
    smp = AliasSampler.from_device_graph(dg)
    key = jax.random.PRNGKey(0)
    cur = jnp.zeros(200_000, jnp.int32)
    nxt = np.asarray(smp.step(cur, key))
    freq = np.bincount(nxt, minlength=3) / len(nxt)
    np.testing.assert_allclose(freq, [0.6, 0.3, 0.1], atol=5e-3)


def test_cdf_matches_alias_distribution():
    g = Graph(n=3,
              src=np.array([0, 0, 0], np.int32),
              dst=np.array([0, 1, 2], np.int32),
              prob=np.array([0.25, 0.5, 0.25]))
    dg = DeviceGraph.from_graph(g)
    smp = CdfSampler.from_device_graph(dg)
    nxt = np.asarray(smp.step(jnp.zeros(100_000, jnp.int32), jax.random.PRNGKey(1)))
    freq = np.bincount(nxt, minlength=3) / len(nxt)
    np.testing.assert_allclose(freq, [0.25, 0.5, 0.25], atol=6e-3)


def test_walks_follow_edges(cornell_graph):
    dg = DeviceGraph.from_graph(cornell_graph)
    smp = AliasSampler.from_device_graph(dg)
    paths = np.asarray(sample_paths(smp, jax.random.PRNGKey(0),
                                    jnp.arange(dg.n), 8, 4))
    assert paths.shape == (dg.n, 8, 4)
    # v0 == start
    np.testing.assert_array_equal(paths[:, :, 0],
                                  np.tile(np.arange(dg.n)[:, None], (1, 8)))
    # every transition is a real record
    edges = set(zip(cornell_graph.src.tolist(), cornell_graph.dst.tolist()))
    flat = paths.reshape(-1, 4)
    for row in flat[:500]:
        for a, b in zip(row[:-1], row[1:]):
            assert (int(a), int(b)) in edges


def test_walk_reproducible_and_epoch_varying(cornell_graph):
    ps = PathSampler.build(cornell_graph, num_walks=4, walk_len=4)
    k = jax.random.PRNGKey(3)
    p1, d1 = ps.sample_epoch(k, 0)
    p2, d2 = ps.sample_epoch(k, 0)
    p3, _ = ps.sample_epoch(k, 1)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert not np.array_equal(np.asarray(p1), np.asarray(p3))


def test_empirical_transition_frequencies(small_graph):
    """Long-run empirical next-hop frequencies ≈ MERW P rows."""
    dg = DeviceGraph.from_graph(small_graph)
    smp = AliasSampler.from_device_graph(dg)
    u = 0
    deg = int(np.asarray(dg.deg)[u])
    cur = jnp.full((300_000,), u, jnp.int32)
    nxt = np.asarray(smp.step(cur, jax.random.PRNGKey(7)))
    freq = np.bincount(nxt, minlength=dg.n) / len(nxt)
    expect = np.zeros(dg.n)
    nbr = np.asarray(dg.nbr)[u, :deg]
    prob = np.asarray(dg.prob)[u, :deg]
    for v, p in zip(nbr, prob):
        expect[v] += p
    np.testing.assert_allclose(freq, expect, atol=6e-3)


def test_distance_table_matches_host_oracle(cornell_graph):
    dev = np.asarray(bfs_distance_table(cornell_graph, max_hops=4, chunk=64))
    host = bfs_distance_table_host(cornell_graph, max_hops=4)
    np.testing.assert_array_equal(dev, host)


def test_distance_semantics_line_graph():
    g = _line_graph(6)
    d = np.asarray(bfs_distance_table(g, max_hops=3, chunk=8))
    assert d[0, 0] == 0 and d[0, 1] == 1 and d[0, 3] == 3
    assert d[0, 4] == -1  # beyond truncation
    assert d[5, 2] == 3


def test_sampled_distances_in_range(cornell_graph):
    ps = PathSampler.build(cornell_graph, num_walks=6, walk_len=4)
    paths, dists = ps.sample_epoch(jax.random.PRNGKey(0), 0)
    d = np.asarray(dists)
    # d_i is in [0, i]: a node reached in i steps is at most i hops away
    assert d.min() >= 0
    steps = np.arange(4)[None, None, :]
    assert (d <= steps).all()
    assert (d[:, :, 0] == 0).all()


def test_uniform_kind_symmetrizes():
    g = Graph(n=3, src=np.array([0], np.int32), dst=np.array([1], np.int32),
              prob=np.ones(1))
    ps = PathSampler.build(g, num_walks=16, walk_len=3, kind="uniform")
    paths, _ = ps.sample_epoch(jax.random.PRNGKey(0), 0)
    p = np.asarray(paths)
    # node 2 is isolated except its self-loop
    assert (p[2] == 2).all()
    # node 1 can reach 0 via the symmetrized reverse edge
    assert (p[1] == 0).any()


def test_membership_dists_match_table(cornell_graph):
    """The membership (N1/N2) distance backend equals the dense-table
    backend for walk_len <= 4."""
    import jax
    ps_m = PathSampler.build(cornell_graph, num_walks=10, walk_len=4,
                             distance_backend="membership")
    ps_t = PathSampler.build(cornell_graph, num_walks=10, walk_len=4,
                             distance_backend="dense", distance_chunk=64)
    k = jax.random.PRNGKey(5)
    pm, dm = ps_m.sample_epoch(k, 0)
    pt, dt = ps_t.sample_epoch(k, 0)
    np.testing.assert_array_equal(np.asarray(pm), np.asarray(pt))
    np.testing.assert_array_equal(np.asarray(dm), np.asarray(dt))


def test_membership_dists_small_graph(small_graph):
    import jax
    ps_m = PathSampler.build(small_graph, num_walks=6, walk_len=3,
                             distance_backend="membership")
    ps_t = PathSampler.build(small_graph, num_walks=6, walk_len=3,
                             distance_backend="host")
    k = jax.random.PRNGKey(9)
    pm, dm = ps_m.sample_epoch(k, 2)
    pt, dt = ps_t.sample_epoch(k, 2)
    np.testing.assert_array_equal(np.asarray(pm), np.asarray(pt))
    np.testing.assert_array_equal(np.asarray(dm), np.asarray(dt))


def test_khop_dists_match_membership_wl4(cornell_graph):
    """khop backend == membership backend at walk_len=4 (same walks)."""
    import jax

    from pathnet_tpu.sample import PathSampler

    ps_m = PathSampler.build(cornell_graph, num_walks=8, walk_len=4,
                             distance_backend="membership")
    ps_k = PathSampler.build(cornell_graph, num_walks=8, walk_len=4,
                             distance_backend="khop")
    key = jax.random.PRNGKey(3)
    pm, dm = ps_m.sample(key)
    pk, dk = ps_k.sample(key)
    np.testing.assert_array_equal(np.asarray(pm), np.asarray(pk))
    np.testing.assert_array_equal(np.asarray(dm), np.asarray(dk))


def test_khop_dists_match_host_oracle_wl5(cornell_graph):
    """walk_len=5 (the reference's longest ablation) via k-hop tables ==
    the scipy BFS oracle — the memory-bounded wl=5 path (VERDICT r2 #5)."""
    import jax

    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.sample.distance import bfs_distance_table_host

    g = cornell_graph
    ps = PathSampler.build(g, num_walks=8, walk_len=5,
                           distance_backend="khop")
    assert ps.khop is not None and len(ps.khop) == 4
    key = jax.random.PRNGKey(4)
    paths, dists = ps.sample(key)
    table = bfs_distance_table_host(g, 5)
    starts = np.arange(g.n)
    expect = table[starts[:, None, None], np.asarray(paths)]
    # oracle is untruncated within 5 hops; walk nodes are within wl-1 hops
    np.testing.assert_array_equal(np.asarray(dists), expect)


def test_khop_dists_small_graph_wl5(small_graph):
    import jax

    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.sample.distance import bfs_distance_table_host

    g = small_graph
    ps = PathSampler.build(g, num_walks=6, walk_len=5,
                           distance_backend="khop")
    paths, dists = ps.sample(jax.random.PRNGKey(0))
    table = bfs_distance_table_host(g, 5)
    expect = table[np.arange(g.n)[:, None, None], np.asarray(paths)]
    np.testing.assert_array_equal(np.asarray(dists), expect)
