import os

import numpy as np
import scipy.sparse.linalg as spla

from pathnet_tpu.data import Graph, DeviceGraph
from pathnet_tpu.merw import (
    principal_eigenpair,
    merw_record_probs,
    merw_padded_probs,
    merw_graph,
    stationary_distribution,
    recover_integer_weights,
)

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "edge_input")


def _cornell():
    return Graph.from_edge_input(os.path.join(DATA, "cornell.in"), name="cornell")


def test_eigenpair_matches_scipy():
    g = _cornell()
    psi, lam = principal_eigenpair(g)
    a = g.to_adjacency(binary=True)
    w, v = spla.eigsh(a.astype(np.float64), k=1, which="LA")
    v0 = np.abs(v[:, 0]) / np.linalg.norm(v[:, 0])
    assert abs(float(lam) - w[0]) / w[0] < 1e-4
    np.testing.assert_allclose(np.asarray(psi), v0, atol=5e-4)


def test_merw_rows_sum_to_one():
    g = _cornell()
    dg = DeviceGraph.from_graph(g)
    psi, lam = principal_eigenpair(g)
    p = np.asarray(merw_padded_probs(dg, psi, lam))
    np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-5)


def test_merw_reproduces_reference_probs_weighted():
    """The p column checked into cornell.in *is* the reference MERW output
    (written by init_rw.py:81-86).  Its source adjacency had diagonal 2 at
    nodes with original WebKB self-loops; recovering integer weights and
    recomputing must reproduce the file column (scipy f64 path for tight
    tolerance)."""
    g = _cornell()
    w_rec = recover_integer_weights(g, g.prob)
    assert set(np.unique(w_rec)) <= {1.0, 2.0}
    # scipy f64 eigenpair on the recovered weighted adjacency.  Records are
    # duplicated (each pair appears twice, init_rw.py writes both directions
    # of an already-symmetric matrix), so summing duplicates gives 2*A —
    # MERW probabilities are scale-invariant, P(cA) = P(A).
    import scipy.sparse as sp
    a = sp.csr_matrix((w_rec, (g.src, g.dst)), shape=(g.n, g.n))
    a.sum_duplicates()
    w, v = spla.eigsh(a, k=1, which="LA")
    psi = np.abs(v[:, 0])
    a_uv = np.asarray(a[g.src, g.dst]).ravel()
    ours = a_uv * psi[g.dst] / (w[0] * psi[g.src])
    np.testing.assert_allclose(ours, g.prob, rtol=1e-4)


def test_merw_binary_close_on_nonquirk_records():
    """Binary-adjacency MERW matches the file everywhere except records
    touching the three doubled-diagonal nodes (f32 device path)."""
    g = _cornell()
    psi, lam = principal_eigenpair(g)
    ours = merw_record_probs(g, np.asarray(psi), float(lam))
    rel = np.abs(ours - g.prob) / np.maximum(g.prob, 1e-12)
    assert (rel < 1e-2).mean() > 0.97


def test_detailed_balance(small_graph):
    """pi_u P[u,v] == pi_v P[v,u] with pi = psi^2."""
    g = small_graph
    psi, lam = principal_eigenpair(g)
    psi = np.asarray(psi, np.float64)
    p = merw_record_probs(g, psi, float(lam))
    pi = psi ** 2
    fwd = {}
    for u, v, pr in zip(g.src, g.dst, p):
        fwd[(int(u), int(v))] = pr
    for (u, v), pr in fwd.items():
        if (v, u) in fwd:
            np.testing.assert_allclose(pi[u] * pr, pi[v] * fwd[(v, u)], rtol=1e-3)


def test_stationary_distribution_normalized():
    g = _cornell()
    psi, _ = principal_eigenpair(g)
    pi = np.asarray(stationary_distribution(psi))
    assert abs(pi.sum() - 1.0) < 1e-5
    assert (pi >= 0).all()


def test_merw_graph_end_to_end():
    g = _cornell()
    g2 = merw_graph(Graph(n=g.n, src=g.src, dst=g.dst, prob=np.ones(len(g.src)),
                          name="cornell"),
                    weights=recover_integer_weights(g, g.prob))
    np.testing.assert_allclose(g2.prob, g.prob, rtol=5e-3)


def test_merw_per_component_disconnected():
    """Disconnected graph: each component gets its own proper eigenpair.

    The reference's global-eigenvector assembly (compute_merw.py:109-121)
    emits negative/non-stochastic rows off the dominant component (the
    checked-in cora_nsl.in / citeseer.in); per-component MERW must produce a
    stochastic matrix everywhere and match the single-component result on
    each block.
    """
    from pathnet_tpu.merw import merw_graph_per_component

    # two triangles + a disjoint edge pair + an isolated self-loop node
    src = np.array([0, 1, 1, 2, 2, 0, 3, 4, 4, 5, 5, 3, 6, 7, 8],
                   np.int32)
    dst = np.array([1, 0, 2, 1, 0, 2, 4, 3, 5, 4, 3, 5, 7, 6, 8],
                   np.int32)
    g = merw_graph_per_component(Graph(n=9, src=src, dst=dst,
                                       prob=np.ones(len(src))))
    assert np.isfinite(g.prob).all() and (g.prob >= 0).all()
    rows = np.zeros(9)
    np.add.at(rows, g.src, g.prob)
    has = np.bincount(g.src, minlength=9) > 0
    np.testing.assert_allclose(rows[has], 1.0, atol=1e-5)
    # triangle block matches the connected-graph computation
    tri = merw_graph(Graph(n=3, src=src[:6] % 3, dst=dst[:6] % 3,
                           prob=np.ones(6)))
    np.testing.assert_allclose(g.prob[:6], tri.prob, rtol=1e-4)


def test_registry_recomputes_broken_probability_columns():
    """cora_nsl.in carries the reference's broken column; the registry must
    deliver a proper stochastic matrix that is MORE MERW-consistent than the
    file.

    Fidelity criterion: for any true MERW, ``lam * sqrt(P[u,v] * P[v,u]) =
    A[u,v]`` — an integer.  The file's decay-tail rows violate it (2.4933
    where the true weight is 2) because ARPACK computes psi to absolute, not
    relative, precision and psi ~ lam**-dist underflows that; the log-space
    per-component recompute preserves it everywhere.
    """
    from pathnet_tpu.data.registry import load_structure

    raw = Graph.from_edge_input("data/edge_input/cora_nsl.in", name="cora")
    assert (raw.prob < 0).any()          # the artifact this guards against
    g = load_structure("cora", "data")
    assert (g.prob >= 0).all() and np.isfinite(g.prob).all()
    key = g.src.astype(np.int64) * g.n + g.dst.astype(np.int64)
    _, first = np.unique(key, return_index=True)
    rows = np.zeros(g.n)
    np.add.at(rows, g.src[first], g.prob[first])
    has = np.bincount(g.src[first], minlength=g.n) > 0
    np.testing.assert_allclose(rows[has], 1.0, atol=1e-6)

    import scipy.sparse as sp

    adj = sp.csr_matrix((np.ones(len(raw.src)), (raw.src, raw.dst)),
                        (g.n, g.n))
    _, comp = sp.csgraph.connected_components(adj, directed=False)
    dom = np.argmax(np.bincount(comp))

    # dominant-component agreement with the file where the file is sane
    # (positive records): median must be tiny — deviations are confined to
    # the file's own non-stochastic psi-noise rows
    m = (comp[raw.src] == dom) & (raw.prob > 0)
    rel = np.abs(g.prob[m] - raw.prob[m]) / np.maximum(raw.prob[m], 1e-9)
    assert np.median(rel) < 1e-3
    # ...and those deviations are the file's fault: every deviating record
    # sits on a reference row that is not stochastic, or mirrors one
    ref_rows = np.zeros(g.n)
    np.add.at(ref_rows, raw.src[first], raw.prob[first])
    dev = m.copy()
    dev[m] = rel > 0.01
    bad_row = np.abs(ref_rows - 1) > 1e-3
    touches_bad = bad_row[raw.src[dev]] | bad_row[raw.dst[dev]]
    assert touches_bad.mean() > 0.9
