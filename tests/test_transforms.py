import numpy as np
import scipy.sparse as sp

from pathnet_tpu.data.transforms import (add_self_loops, chebyshev_polynomials,
                                         laplacian, nhood, nhood_split,
                                         remove_self_loops, rw_normalize,
                                         sym_normalize)


def _path_adj(k=6):
    a = sp.lil_matrix((k, k))
    for i in range(k - 1):
        a[i, i + 1] = 1
        a[i + 1, i] = 1
    return a.tocsr()


def test_self_loops_roundtrip():
    a = _path_adj()
    al = add_self_loops(a)
    assert (al.diagonal() == 1).all()
    ar = remove_self_loops(al)
    assert (ar.diagonal() == 0).all()
    np.testing.assert_array_equal(ar.toarray(), a.toarray())


def test_normalizations():
    a = _path_adj()
    s = sym_normalize(a).toarray()
    np.testing.assert_allclose(s, s.T, atol=1e-12)
    r = rw_normalize(a).toarray()
    np.testing.assert_allclose(r.sum(1), 1.0, atol=1e-12)


def test_laplacian_psd():
    a = _path_adj()
    l = laplacian(a, normalized=True).toarray()
    w = np.linalg.eigvalsh(l)
    assert w.min() > -1e-9 and w.max() < 2 + 1e-9


def test_nhood_and_split():
    a = _path_adj(6)
    n2 = nhood(a, 2).toarray()
    assert n2[0, 2] == 1 and n2[0, 3] == 0 and n2[0, 0] == 1
    rings = nhood_split(a, 3)
    assert rings[0][0, 1] == 1 and rings[0][0, 2] == 0
    assert rings[1][0, 2] == 1 and rings[1][0, 1] == 0
    assert rings[2][0, 3] == 1 and rings[2][0, 2] == 0


def test_chebyshev_basis():
    a = _path_adj()
    tks = chebyshev_polynomials(a, 3)
    assert len(tks) == 4
    np.testing.assert_array_equal(tks[0].toarray(), np.eye(6))


def test_merw_extras(small_graph):
    import jax.numpy as jnp
    from pathnet_tpu.merw.extras import (basic_simrank, compute_grw,
                                         merw_simrank, p_distance)
    g = small_graph
    p, pi = compute_grw(g)
    rowsum = np.asarray(p).sum(1)
    deg = np.asarray(g.to_adjacency(binary=True).sum(1)).ravel()
    np.testing.assert_allclose(rowsum[deg > 0], 1.0, atol=1e-5)
    assert (rowsum[deg == 0] == 0).all()   # isolated nodes: zero rows
    np.testing.assert_allclose(float(jnp.sum(pi)), 1.0, atol=1e-5)
    s = np.asarray(merw_simrank(g, iters=5))
    assert (np.diag(s) == 1.0).all()
    np.testing.assert_allclose(s, s.T, atol=1e-4)
    s2 = np.asarray(basic_simrank(g, iters=5))
    assert (np.diag(s2) == 1.0).all()
    d = np.asarray(p_distance(p))
    assert np.isfinite(d).all()
