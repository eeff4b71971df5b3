"""Golden-value tests: PAGG forwards vs a torch oracle.

The oracle below re-expresses the documented reference semantics
(PathNet_run.py:172-277, incl. the hetero index-layout quirks noted in
SURVEY.md §2.4) with torch primitives, loading *our* parameters — so any
disagreement localizes to our forward math, not initialization.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
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
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-3)


def test_homo_matches_reference_semantics():
    spec, params, X, paths, dists = _setup("homo")
    ours = pagg_forward(params, jnp.asarray(X), jnp.asarray(paths),
                        jnp.asarray(dists), jnp.arange(7), spec, train=False)
    # atol covers f32 vs f64 accumulation-order noise (incl. the onehot
    # dist-select form, f64-identical but f32-reordered)
    oracle = torch_homo_oracle(params, X, paths, dists)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-3)


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


# ---------------------------------------------------------------------------
# training-mode parity (VERDICT r4 next #5): grads + one full Adam update
# vs torch — rules training dynamics in/out of any accuracy anomaly.  The
# eval oracles above validate forward semantics (incl. nn.LSTM gates); here
# a differentiable torch twin (manual LSTM, same gate order) provides
# reference gradients and torch.optim.Adam provides the update semantics
# (additive L2, PathNet_run.py:295-296).
# ---------------------------------------------------------------------------

def _torch_lstm_diff(tp, seq):
    """Differentiable torch LSTM (i,f,g,o gate order = torch = ours)."""
    L, B, H = seq.shape
    h = torch.zeros(B, H, dtype=seq.dtype)
    c = torch.zeros(B, H, dtype=seq.dtype)
    for t in range(L):
        gates = (seq[t] @ tp["rnn"]["w_ih"] + tp["rnn"]["b_ih"]
                 + h @ tp["rnn"]["w_hh"] + tp["rnn"]["b_hh"])
        i, f, g, o = gates.chunk(4, dim=-1)
        i, f, o = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o)
        c = f * c + i * torch.tanh(g)
        h = o * torch.tanh(c)
    return h


def _torch_forward_diff(tp, X, paths, dists, variant):
    """Differentiable twin of the eval oracles (dropout off)."""
    X = torch.tensor(X, dtype=torch.float64)
    T, nw, wl = paths.shape
    B = T * nw
    H = tp["fc0"]["w"].shape[1]
    if variant == "homo":
        h = torch.relu(X @ tp["fc0"]["w"] + tp["fc0"]["b"])
        flat = h[torch.tensor(paths.reshape(-1))]
        zs = torch.stack([flat @ tp["dist"]["w"][k] + tp["dist"]["b"][k]
                          for k in range(wl)], dim=1)
        lt = torch.tensor(dists.reshape(-1), dtype=torch.long)
        sel = torch.relu(zs[torch.arange(B * wl), lt].view(B, wl, H))
        ego_full = sel.reshape(T, nw, wl, H)[:, :, 0, :]
        h_n = _torch_lstm_diff(tp, sel.transpose(0, 1)).view(T, nw, H)
        att = (torch.cat([h_n, ego_full], dim=-1) @ tp["attw"]["w"]
               + tp["attw"]["b"])
        h_agg = ((1 + att) * h_n).mean(dim=1)
        out = torch.cat([h[: T], h_agg], dim=1)
        return out @ tp["fc2"]["w"] + tp["fc2"]["b"]
    # hetero, quirk semantics (PathNet_run.py:172-211)
    h = X @ tp["fc0"]["w"] + tp["fc0"]["b"]
    nei = h[torch.tensor(paths.reshape(-1))].view(B, wl, H)
    seq = nei.transpose(0, 1)
    flat = torch.flip(seq, dims=[0]).reshape(B * wl, H)
    zs = torch.stack([flat @ tp["dist"]["w"][k] + tp["dist"]["b"][k]
                      for k in range(wl)], dim=1)
    lt = torch.tensor(dists.reshape(-1), dtype=torch.long)
    sel = zs[torch.arange(B * wl), lt].view(B, wl, H).transpose(0, 1)
    h_n = _torch_lstm_diff(tp, sel).view(nw, T, H)
    first = seq[0].view(nw, T, H)
    cat = torch.cat([h_n, first], dim=-1)
    score = cat @ tp["attw"]["w"] + tp["attw"]["b"]
    att = torch.softmax(torch.nn.functional.leaky_relu(score), dim=0)
    h_agg = (att * h_n).mean(dim=0)
    out = torch.cat([h[: T], h_agg], dim=1)
    return out @ tp["fc2"]["w"] + tp["fc2"]["b"]


def _leaf_params(params):
    tp = jax.tree_util.tree_map(
        lambda a: torch.tensor(np.asarray(a), dtype=torch.float64,
                               requires_grad=True), params)
    return tp


def _train_setup(variant):
    spec, params, X, paths, dists = _setup(variant)
    spec = PaggSpec(**{**spec.__dict__, "dropout": 0.0,
                       "quirk_compat": variant == "hetero",
                       "gather_mode": "h"})
    y = np.arange(7) % spec.out_dim
    return spec, params, X, paths, dists, y


def _our_grads(spec, params, X, paths, dists, y):
    import optax

    def loss_fn(p):
        logits = pagg_forward(p, jnp.asarray(X), jnp.asarray(paths),
                              jnp.asarray(dists), jnp.arange(7), spec,
                              train=True, key=jax.random.PRNGKey(0))
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(y)).mean()
    return jax.value_and_grad(loss_fn)(params)


def _torch_grads(params, X, paths, dists, y, variant):
    tp = _leaf_params(params)
    logits = _torch_forward_diff(tp, X, paths, dists, variant)
    loss = torch.nn.functional.cross_entropy(
        logits, torch.tensor(y, dtype=torch.long))
    loss.backward()
    grads = jax.tree_util.tree_map(lambda t: t.grad.numpy(), tp)
    return float(loss.detach()), tp, grads


@pytest.mark.parametrize("variant", ["hetero", "homo"])
def test_training_grads_match_torch(variant):
    spec, params, X, paths, dists, y = _train_setup(variant)
    loss_j, grads_j = _our_grads(spec, params, X, paths, dists, y)
    loss_t, _, grads_t = _torch_grads(params, X, paths, dists, y, variant)
    assert abs(float(loss_j) - loss_t) < 1e-4
    flat_j = jax.tree_util.tree_leaves(grads_j)
    flat_t = jax.tree_util.tree_leaves(grads_t)
    for a, b in zip(flat_j, flat_t):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-4,
                                   err_msg=f"{variant} grad mismatch")


def test_adam_update_matches_torch():
    """make_optimizer == torch.optim.Adam(lr, weight_decay): additive L2
    before the moment update, identical bias correction/eps, over 5 steps
    with prescribed gradients."""
    from pathnet_tpu.train.trainer import make_optimizer
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    gs = [rng.normal(size=(4, 3)).astype(np.float32) * 10 ** (-i)
          for i in range(5)]
    lr, wd = 5e-3, 5e-4

    opt = make_optimizer(lr, wd)
    p = {"w": jnp.asarray(w0)}
    state = opt.init(p)
    for g in gs:
        upd, state = opt.update({"w": jnp.asarray(g)}, state, p)
        import optax
        p = optax.apply_updates(p, upd)

    tw = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    for g in gs:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(p["w"]), tw.detach().numpy(),
                               atol=2e-6)


@pytest.mark.parametrize("variant", ["hetero", "homo"])
def test_one_training_update_matches_torch(variant):
    """Composed end-to-end check: one full forward→CE→backward→Adam step
    produces the same parameters as the torch twin (the reference's
    training update, PathNet_run.py:293-352, dropout off)."""
    import optax
    from pathnet_tpu.train.trainer import make_optimizer
    spec, params, X, paths, dists, y = _train_setup(variant)
    lr, wd = 5e-3, 5e-4

    _, grads_j = _our_grads(spec, params, X, paths, dists, y)
    opt = make_optimizer(lr, wd)
    upd, _ = opt.update(grads_j, opt.init(params), params)
    ours = optax.apply_updates(params, upd)

    _, tp, _ = _torch_grads(params, X, paths, dists, y, variant)
    topt = torch.optim.Adam(jax.tree_util.tree_leaves(tp), lr=lr,
                            weight_decay=wd)
    topt.step()
    theirs = jax.tree_util.tree_map(lambda t: t.detach().numpy(), tp)
    for a, b in zip(jax.tree_util.tree_leaves(ours),
                    jax.tree_util.tree_leaves(theirs)):
        # Adam's first step is ~sign(g)·lr: tolerance is in lr units
        np.testing.assert_allclose(np.asarray(a), b, atol=5e-4,
                                   err_msg=f"{variant} param mismatch")
