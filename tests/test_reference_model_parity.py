"""Output parity against the REFERENCE'S OWN torch models.

The reference's neural_networks.py runs on CPU torch in this image, so the
strongest possible parity check is direct: instantiate the reference class,
copy its weights into our JAX module, and compare outputs on the same
input (eval mode — deterministic).  Covers MLP, liGRU, GRU, LSTM,
minimalGRU, RNN, CNN, and SincNet (slow SincConv variant).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree absent"
)
if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import neural_networks as ref_nn  # noqa: E402

import tpukaldi.models as M  # noqa: E402

T, B, D, H = 11, 3, 7, 10


def _t2j(w):
    return jnp.asarray(w.detach().numpy())


def _run_ref(module, x):
    with torch.no_grad():
        return module(torch.from_numpy(np.asarray(x))).numpy()


def _apply(model, params, x):
    return np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  train=False))


def test_mlp_matches_reference():
    opts = {
        "dnn_lay": "12,6",
        "dnn_drop": "0.0,0.0",
        "dnn_use_batchnorm": "False,False",
        "dnn_use_laynorm": "True,False",
        "dnn_use_laynorm_inp": "False",
        "dnn_use_batchnorm_inp": "False",
        "dnn_act": "relu,softmax",
        "use_cuda": "False",
        "to_do": "forward",
    }
    ref = ref_nn.MLP(opts, D).eval()
    x = np.random.default_rng(0).standard_normal((B * 4, D)).astype(np.float32)
    want = _run_ref(ref, x)

    ours = M.MLP(options=opts, inp_dim=D)
    v = ours.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    p = dict(v["params"])
    for i in range(2):
        dense = dict(p[f"wx{i}"])
        dense["kernel"] = _t2j(ref.wx[i].weight).T
        if "bias" in dense:
            dense["bias"] = _t2j(ref.wx[i].bias)
        p[f"wx{i}"] = dense
    ln0 = dict(p["ln0"])
    ln0["gamma"] = _t2j(ref.ln[0].gamma)
    ln0["beta"] = _t2j(ref.ln[0].beta)
    p["ln0"] = ln0
    got = _apply(ours, p, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _recurrent_opts(prefix, act="relu", bidir=True):
    return {
        f"{prefix}_lay": str(H),
        f"{prefix}_drop": "0.0",
        f"{prefix}_use_laynorm_inp": "False",
        f"{prefix}_use_batchnorm_inp": "False",
        f"{prefix}_use_laynorm": "False",
        f"{prefix}_use_batchnorm": "False",
        f"{prefix}_bidir": "True" if bidir else "False",
        f"{prefix}_act": act,
        f"{prefix}_orthinit": "True",
        "use_cuda": "False",
        "to_do": "forward",
    }


def _copy_gates(p, ref, gates, layer=0):
    """Copy per-gate w/u (+biases) from the reference module lists."""
    new = dict(p)
    for g, (w_list, u_list) in gates.items():
        new[f"w{g}{layer}"] = _t2j(w_list[layer].weight).T
        if w_list[layer].bias is not None:
            new[f"b{g}{layer}"] = _t2j(w_list[layer].bias)
        if u_list is not None:
            new[f"u{g}{layer}"] = _t2j(u_list[layer].weight).T
    return new


@pytest.mark.parametrize("bidir", [False, True])
def test_ligru_matches_reference(bidir):
    opts = _recurrent_opts("ligru", bidir=bidir)
    ref = ref_nn.liGRU(opts, D).eval()
    x = np.random.default_rng(1).standard_normal((T, B, D)).astype(np.float32)
    want = _run_ref(ref, x)
    ours = M.liGRU(options=opts, inp_dim=D)
    v = ours.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    p = _copy_gates(v["params"], ref,
                    {"h": (ref.wh, ref.uh), "z": (ref.wz, ref.uz)})
    got = _apply(ours, p, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gru_matches_reference():
    opts = _recurrent_opts("gru", act="tanh")
    ref = ref_nn.GRU(opts, D).eval()
    x = np.random.default_rng(2).standard_normal((T, B, D)).astype(np.float32)
    want = _run_ref(ref, x)
    ours = M.GRU(options=opts, inp_dim=D)
    v = ours.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    p = _copy_gates(v["params"], ref,
                    {"h": (ref.wh, None), "z": (ref.wz, ref.uz),
                     "r": (ref.wr, ref.ur)})
    p["uh0"] = _t2j(ref.uh[0].weight).T
    got = _apply(ours, p, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lstm_matches_reference():
    opts = _recurrent_opts("lstm", act="tanh")
    ref = ref_nn.LSTM(opts, D).eval()
    x = np.random.default_rng(3).standard_normal((T, B, D)).astype(np.float32)
    want = _run_ref(ref, x)
    ours = M.LSTM(options=opts, inp_dim=D)
    v = ours.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    p = _copy_gates(v["params"], ref,
                    {"f": (ref.wfx, ref.ufh), "i": (ref.wix, ref.uih),
                     "o": (ref.wox, ref.uoh), "c": (ref.wcx, ref.uch)})
    got = _apply(ours, p, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_minimalgru_matches_reference():
    opts = _recurrent_opts("minimalgru", act="tanh")
    ref = ref_nn.minimalGRU(opts, D).eval()
    x = np.random.default_rng(4).standard_normal((T, B, D)).astype(np.float32)
    want = _run_ref(ref, x)
    ours = M.minimalGRU(options=opts, inp_dim=D)
    v = ours.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    p = _copy_gates(v["params"], ref,
                    {"h": (ref.wh, None), "z": (ref.wz, ref.uz)})
    p["uh0"] = _t2j(ref.uh[0].weight).T
    got = _apply(ours, p, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rnn_matches_reference():
    opts = _recurrent_opts("rnn", act="tanh")
    ref = ref_nn.RNN(opts, D).eval()
    x = np.random.default_rng(5).standard_normal((T, B, D)).astype(np.float32)
    want = _run_ref(ref, x)
    ours = M.RNN(options=opts, inp_dim=D)
    v = ours.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    p = _copy_gates(v["params"], ref, {"h": (ref.wh, ref.uh)})
    got = _apply(ours, p, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cnn_matches_reference():
    L = 200
    opts = {
        "cnn_n_filt": "4,6",
        "cnn_N_filt": "4,6",
        "cnn_len_filt": "11,5",
        "cnn_max_pool_len": "2,2",
        "cnn_act": "relu,relu",
        "cnn_drop": "0.0,0.0",
        "cnn_use_laynorm": "False,False",
        "cnn_use_batchnorm": "False,False",
        "cnn_use_laynorm_inp": "False",
        "cnn_use_batchnorm_inp": "False",
        "use_cuda": "False",
        "to_do": "forward",
    }
    ref = ref_nn.CNN(opts, L).eval()
    x = np.random.default_rng(6).standard_normal((5, L)).astype(np.float32)
    want = _run_ref(ref, x)
    ours = M.CNN(options=opts, inp_dim=L)
    v = ours.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    p = dict(v["params"])
    for i in range(2):
        p[f"conv{i}"] = _t2j(ref.conv[i].weight)
        p[f"conv{i}_b"] = _t2j(ref.conv[i].bias)
    got = _apply(ours, p, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sincnet_matches_reference():
    L = 200
    opts = {
        "sinc_n_filt": "8",
        "sinc_N_filt": "8",
        "sinc_len_filt": "65",
        "sinc_max_pool_len": "2",
        "sinc_act": "relu",
        "sinc_drop": "0.0",
        "sinc_use_laynorm": "False",
        "sinc_use_batchnorm": "False",
        "sinc_use_laynorm_inp": "False",
        "sinc_use_batchnorm_inp": "False",
        "sinc_sample_rate": "16000",
        "sinc_min_low_hz": "50",
        "sinc_min_band_hz": "50",
        "sinc_fast": "False",  # reference SincNet uses the original SincConv
        "use_cuda": "False",
        "to_do": "forward",
    }
    ref = ref_nn.SincNet(opts, L).eval()
    x = np.random.default_rng(7).standard_normal((4, L)).astype(np.float32)
    want = _run_ref(ref, x)
    ours = M.SincNet(options=opts, inp_dim=L)
    v = ours.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    p = dict(v["params"])
    p["low_hz"] = _t2j(ref.conv[0].low_hz_)
    p["band_hz"] = _t2j(ref.conv[0].band_hz_)
    got = _apply(ours, p, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
