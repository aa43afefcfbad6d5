"""Numerical parity of the *_cudnn family against torch.nn.LSTM/GRU/RNN
(CPU torch is available in the image): weights copied across, outputs
compared for uni- and bidirectional stacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tpukaldi.models import GRU_cudnn, LSTM_cudnn, RNN_cudnn

T, B, D, H = 9, 3, 5, 6


def _opts(bidir, layers=1, nonlin="tanh"):
    return {
        "hidden_size": str(H),
        "num_layers": str(layers),
        "bias": "True",
        "batch_first": "False",
        "dropout": "0.0",
        "bidirectional": "True" if bidir else "False",
        "nonlinearity": nonlin,
    }


def _copy_torch_weights(tmod, ours_params, layers, bidir):
    """Map torch per-direction (GH, D)/(GH, H) weights into our
    (K, D, GH)/(K, H, GH) params."""
    new = dict(ours_params)
    K = 2 if bidir else 1
    for layer in range(layers):
        w_ih, w_hh, b_ih, b_hh = [], [], [], []
        for k in range(K):
            sfx = f"_l{layer}" + ("_reverse" if k == 1 else "")
            w_ih.append(getattr(tmod, f"weight_ih{sfx}").detach().numpy().T)
            w_hh.append(getattr(tmod, f"weight_hh{sfx}").detach().numpy().T)
            b_ih.append(getattr(tmod, f"bias_ih{sfx}").detach().numpy())
            b_hh.append(getattr(tmod, f"bias_hh{sfx}").detach().numpy())
        new[f"w_ih{layer}"] = jnp.asarray(np.stack(w_ih))
        new[f"w_hh{layer}"] = jnp.asarray(np.stack(w_hh))
        new[f"b_ih{layer}"] = jnp.asarray(np.stack(b_ih))
        new[f"b_hh{layer}"] = jnp.asarray(np.stack(b_hh))
    return new


@pytest.mark.parametrize("bidir", [False, True])
@pytest.mark.parametrize("layers", [1, 2])
def test_lstm_cudnn_matches_torch(bidir, layers):
    x = np.random.default_rng(0).standard_normal((T, B, D)).astype(np.float32)
    tmod = torch.nn.LSTM(D, H, num_layers=layers, bidirectional=bidir)
    with torch.no_grad():
        want, _ = tmod(torch.from_numpy(x))
    model = LSTM_cudnn(options=_opts(bidir, layers), inp_dim=D)
    v = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    params = _copy_torch_weights(tmod, v["params"], layers, bidir)
    got = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("bidir", [False, True])
def test_gru_cudnn_matches_torch(bidir):
    x = np.random.default_rng(1).standard_normal((T, B, D)).astype(np.float32)
    tmod = torch.nn.GRU(D, H, num_layers=2, bidirectional=bidir)
    with torch.no_grad():
        want, _ = tmod(torch.from_numpy(x))
    model = GRU_cudnn(options=_opts(bidir, 2), inp_dim=D)
    v = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    params = _copy_torch_weights(tmod, v["params"], 2, bidir)
    got = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("nonlin", ["tanh", "relu"])
def test_rnn_cudnn_matches_torch(nonlin):
    x = np.random.default_rng(2).standard_normal((T, B, D)).astype(np.float32)
    tmod = torch.nn.RNN(D, H, num_layers=1, nonlinearity=nonlin,
                        bidirectional=True)
    with torch.no_grad():
        want, _ = tmod(torch.from_numpy(x))
    model = RNN_cudnn(options=_opts(True, 1, nonlin), inp_dim=D)
    v = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    params = _copy_torch_weights(tmod, v["params"], 1, True)
    got = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5
    )
