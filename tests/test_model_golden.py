"""Golden-value tests: PAGG forwards vs a torch oracle.

The oracle below re-expresses the documented reference semantics
(PathNet_run.py:172-277, incl. the hetero index-layout quirks noted in
SURVEY.md §2.4) with torch primitives, loading *our* parameters — so any
disagreement localizes to our forward math, not initialization.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from pathnet_tpu.models import PaggSpec, init_pagg_params, pagg_forward


def _torch_params(params):
    t = lambda a: torch.tensor(np.asarray(a), dtype=torch.float64)
    return jax.tree_util.tree_map(t, params)


def _torch_lstm(tp, seq):
    H = tp["rnn"]["w_hh"].shape[0]
    m = torch.nn.LSTM(H, H).double()
    with torch.no_grad():
        m.weight_ih_l0.copy_(tp["rnn"]["w_ih"].T)
        m.weight_hh_l0.copy_(tp["rnn"]["w_hh"].T)
        m.bias_ih_l0.copy_(tp["rnn"]["b_ih"])
        m.bias_hh_l0.copy_(tp["rnn"]["b_hh"])
        _, (hN, _) = m(seq)
    return hN[0]


def torch_hetero_oracle(params, X, paths, dists):
    """Reference hetero forward semantics (PathNet_run.py:172-211), quirks
    included, in eval mode (no dropout)."""
    tp = _torch_params(params)
    X = torch.tensor(X, dtype=torch.float64)
    T, nw, wl = paths.shape
    B = T * nw
    H = tp["fc0"]["w"].shape[1]
    h = X @ tp["fc0"]["w"] + tp["fc0"]["b"]
    nei = h[torch.tensor(paths.reshape(-1))].view(B, wl, H)
    seq = nei.transpose(0, 1)                                    # [wl, B, H]
    flat = torch.flip(seq, dims=[0]).reshape(B * wl, H)
    zs = torch.stack([flat @ tp["dist"]["w"][k] + tp["dist"]["b"][k]
                      for k in range(wl)], dim=1)
    lt = torch.tensor(dists.reshape(-1), dtype=torch.long)
    sel = zs[torch.arange(B * wl), lt].view(B, wl, H).transpose(0, 1)
    h_n = _torch_lstm(tp, sel)
    h_n = h_n.view(nw, T, H)
    first = seq[0].view(nw, T, H)
    cat = torch.cat([h_n, first], dim=-1)
    score = cat @ tp["attw"]["w"] + tp["attw"]["b"]
    att = torch.softmax(torch.nn.functional.leaky_relu(score), dim=0)
    h_agg = (att * h_n).mean(dim=0)
    ego = h[: T]  # ego_idx = arange(T) in these tests
    out = torch.cat([ego, h_agg], dim=1)
    return (out @ tp["fc2"]["w"] + tp["fc2"]["b"]).numpy()


def torch_homo_oracle(params, X, paths, dists):
    """Reference homo forward semantics (PathNet_run.py:239-278), eval mode."""
    tp = _torch_params(params)
    X = torch.tensor(X, dtype=torch.float64)
    T, nw, wl = paths.shape
    B = T * nw
    H = tp["fc0"]["w"].shape[1]
    h = torch.relu(X @ tp["fc0"]["w"] + tp["fc0"]["b"])
    flat = h[torch.tensor(paths.reshape(-1))]                    # [B*wl, H]
    zs = torch.stack([flat @ tp["dist"]["w"][k] + tp["dist"]["b"][k]
                      for k in range(wl)], dim=1)
    lt = torch.tensor(dists.reshape(-1), dtype=torch.long)
    sel = torch.relu(zs[torch.arange(B * wl), lt].view(B, wl, H))
    ego_full = sel.reshape(T, nw, wl, H)[:, :, 0, :]
    h_n = _torch_lstm(tp, sel.transpose(0, 1)).view(T, nw, H)
    att = torch.cat([h_n, ego_full], dim=-1) @ tp["attw"]["w"] + tp["attw"]["b"]
    h_agg = ((1 + att) * h_n).mean(dim=1)
    out = torch.cat([h[: T], h_agg], dim=1)
    return (out @ tp["fc2"]["w"] + tp["fc2"]["b"]).numpy()


def _setup(variant, seed=0, T=7, nw=5, wl=4, F=11, H=8, C=3, n=20):
    spec = PaggSpec(feat_dim=F, hidden=H, out_dim=C, walk_len=wl,
                    variant=variant, quirk_compat=(variant == "hetero"))
    params = init_pagg_params(jax.random.PRNGKey(seed), spec)
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, F)).astype(np.float32)
    paths = rng.integers(0, n, size=(T, nw, wl)).astype(np.int32)
    paths[:, :, 0] = np.arange(T)[:, None]
    dists = np.minimum(rng.integers(0, wl, size=(T, nw, wl)),
                       np.arange(wl)[None, None, :]).astype(np.int32)
    return spec, params, X, paths, dists


def test_hetero_quirk_matches_reference_semantics():
    spec, params, X, paths, dists = _setup("hetero")
    ours = pagg_forward(params, jnp.asarray(X), jnp.asarray(paths),
                        jnp.asarray(dists), jnp.arange(7), spec, train=False)
    oracle = torch_hetero_oracle(params, X, paths, dists)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=5e-4)


def test_homo_matches_reference_semantics():
    spec, params, X, paths, dists = _setup("homo")
    ours = pagg_forward(params, jnp.asarray(X), jnp.asarray(paths),
                        jnp.asarray(dists), jnp.arange(7), spec, train=False)
    oracle = torch_homo_oracle(params, X, paths, dists)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=5e-4)


def test_intended_hetero_walk_permutation_invariant():
    """Default (non-quirk) hetero semantics: permuting one node's walks must
    not change any output — the quirk mode deliberately breaks this."""
    spec, params, X, paths, dists = _setup("hetero")
    spec_fixed = PaggSpec(**{**spec.__dict__, "quirk_compat": False})
    rng = np.random.default_rng(1)
    perm = rng.permutation(paths.shape[1])
    out1 = pagg_forward(params, jnp.asarray(X), jnp.asarray(paths),
                        jnp.asarray(dists), jnp.arange(7), spec_fixed)
    out2 = pagg_forward(params, jnp.asarray(X), jnp.asarray(paths[:, perm]),
                        jnp.asarray(dists[:, perm]), jnp.arange(7), spec_fixed)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    # quirk mode: same permutation changes outputs
    out3 = pagg_forward(params, jnp.asarray(X), jnp.asarray(paths[:, perm]),
                        jnp.asarray(dists[:, perm]), jnp.arange(7), spec)
    assert not np.allclose(np.asarray(out1), np.asarray(out3), atol=1e-5)


def test_variants_produce_finite_outputs():
    for variant in ("hetero", "homo"):
        for rnn in ("lstm", "gru", "mlp"):
            for agg in ("attention", "mean", "sum"):
                spec, params, X, paths, dists = _setup(variant)
                spec = PaggSpec(**{**spec.__dict__, "rnn": rnn, "agg": agg,
                                   "quirk_compat": False})
                params = init_pagg_params(jax.random.PRNGKey(2), spec)
                out = pagg_forward(params, jnp.asarray(X), jnp.asarray(paths),
                                   jnp.asarray(dists), jnp.arange(7), spec,
                                   train=True, key=jax.random.PRNGKey(3))
                assert np.isfinite(np.asarray(out)).all()


def test_dropout_train_vs_eval():
    spec, params, X, paths, dists = _setup("homo")
    args = (params, jnp.asarray(X), jnp.asarray(paths), jnp.asarray(dists),
            jnp.arange(7), spec)
    e1 = pagg_forward(*args, train=False)
    e2 = pagg_forward(*args, train=False)
    t1 = pagg_forward(*args, train=True, key=jax.random.PRNGKey(0))
    t2 = pagg_forward(*args, train=True, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
