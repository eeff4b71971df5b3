import numpy as np
import jax
import jax.numpy as jnp
import torch

from pathnet_tpu.nn import lstm_scan, gru_scan, confusion_matrix, classification_metrics
from pathnet_tpu.nn.init import torch_lstm_init, torch_gru_init


def test_lstm_matches_torch():
    L, B, H = 4, 6, 8
    params = torch_lstm_init(jax.random.PRNGKey(0), H, H)
    xs = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (L, B, H)))
    ys, h_n = lstm_scan(params, jnp.asarray(xs))

    m = torch.nn.LSTM(H, H)
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.tensor(np.asarray(params["w_ih"]).T))
        m.weight_hh_l0.copy_(torch.tensor(np.asarray(params["w_hh"]).T))
        m.bias_ih_l0.copy_(torch.tensor(np.asarray(params["b_ih"])))
        m.bias_hh_l0.copy_(torch.tensor(np.asarray(params["b_hh"])))
        out, (hN, cN) = m(torch.tensor(xs))
    np.testing.assert_allclose(np.asarray(ys), out.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(h_n), hN[0].numpy(), atol=3e-4)


def test_gru_matches_torch():
    L, B, H = 3, 5, 8
    params = torch_gru_init(jax.random.PRNGKey(0), H, H)
    xs = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (L, B, H)))
    ys, h_n = gru_scan(params, jnp.asarray(xs))

    m = torch.nn.GRU(H, H)
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.tensor(np.asarray(params["w_ih"]).T))
        m.weight_hh_l0.copy_(torch.tensor(np.asarray(params["w_hh"]).T))
        m.bias_ih_l0.copy_(torch.tensor(np.asarray(params["b_ih"])))
        m.bias_hh_l0.copy_(torch.tensor(np.asarray(params["b_hh"])))
        out, hN = m(torch.tensor(xs))
    np.testing.assert_allclose(np.asarray(ys), out.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(h_n), hN[0].numpy(), atol=3e-4)


def test_metrics_match_sklearn():
    from sklearn.metrics import (accuracy_score, f1_score, precision_score,
                                 recall_score)
    rng = np.random.default_rng(0)
    C = 5
    y_true = rng.integers(0, C, 200)
    y_pred = rng.integers(0, C, 200)
    cm = confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), C)
    m = {k: float(v) for k, v in classification_metrics(cm).items()}
    assert abs(m["accuracy"] - accuracy_score(y_true, y_pred)) < 1e-6
    assert abs(m["macro_f1"] - f1_score(y_true, y_pred, average="macro")) < 1e-6
    assert abs(m["micro_f1"] - f1_score(y_true, y_pred, average="micro")) < 1e-6
    assert abs(m["macro_precision"] - precision_score(y_true, y_pred, average="macro",
                                                      zero_division=0)) < 1e-6
    assert abs(m["macro_recall"] - recall_score(y_true, y_pred, average="macro",
                                                zero_division=0)) < 1e-6


def test_metrics_absent_class_macro():
    """sklearn averages over labels present in y_true ∪ y_pred only."""
    from sklearn.metrics import f1_score
    y_true = np.array([0, 0, 1, 1])
    y_pred = np.array([0, 1, 1, 1])
    cm = confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), 5)
    m = classification_metrics(cm)
    assert abs(float(m["macro_f1"]) - f1_score(y_true, y_pred, average="macro")) < 1e-6
