import os

import numpy as np

from pathnet_tpu.data import Graph, read_edge_input, write_edge_input
from pathnet_tpu.data.formats import parse_path_file, write_path_file

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "edge_input")


def test_read_cornell_header():
    n, src, dst, prob = read_edge_input(os.path.join(DATA, "cornell.in"))
    assert n == 183
    assert len(src) == 1474
    assert src.max() < n and dst.max() < n
    assert (prob > 0).all() and (prob <= 1.0 + 1e-9).all()


def test_edge_input_roundtrip(tmp_path):
    n, src, dst, prob = read_edge_input(os.path.join(DATA, "cornell.in"))
    p = tmp_path / "copy.in"
    write_edge_input(str(p), n, src, dst, prob)
    n2, s2, d2, p2 = read_edge_input(str(p))
    assert n2 == n
    np.testing.assert_array_equal(src, s2)
    np.testing.assert_array_equal(dst, d2)
    np.testing.assert_allclose(prob, p2, rtol=1e-12)


def test_path_file_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    nodes = rng.integers(0, 100, size=(12, 4)).astype(np.int32)
    dists = rng.integers(0, 4, size=(12, 4)).astype(np.int32)
    p = tmp_path / "paths.txt"
    write_path_file(str(p), nodes, dists)
    n2, d2 = parse_path_file(str(p), walk_len=4)
    np.testing.assert_array_equal(nodes, n2)
    np.testing.assert_array_equal(dists, d2)


def test_padded_csr_roundtrip():
    g = Graph.from_edge_input(os.path.join(DATA, "cornell.in"))
    nbr, prob, deg = g.padded_csr()
    assert nbr.shape == prob.shape
    assert deg.sum() == len(g.src)
    # row-stochastic over real slots
    np.testing.assert_allclose(prob.sum(1), 1.0, atol=1e-6)
    # every real slot points at a true record
    a = g.to_adjacency(binary=True)
    for u in [0, 5, 50, 182]:
        for j in range(deg[u]):
            assert a[u, nbr[u, j]] != 0 or nbr[u, j] == u


def test_symmetrized_adds_self_loops():
    g = Graph(n=4, src=np.array([0, 1], np.int32), dst=np.array([1, 2], np.int32),
              prob=np.ones(2))
    s = g.symmetrized(add_self_loops=True)
    assert len(s.src) == 2 * 2 + 4
    a = s.to_adjacency(binary=True)
    assert all(a[i, i] != 0 for i in range(4))
    assert a[1, 0] != 0 and a[2, 1] != 0
