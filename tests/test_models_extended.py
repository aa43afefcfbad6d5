"""Extended model-zoo tests: CNN/SincNet raw-wave front-ends, logMelFb,
channel averaging, quaternion layers (incl. lean-VJP gradient parity),
SRU, cudnn-style stacks, fusionRNN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpukaldi.models import (
    CNN,
    GRU_cudnn,
    LSTM_cudnn,
    QLSTM,
    QuaternionDense,
    RNN_cudnn,
    SRU,
    SincNet,
    channel_averaging,
    fusionRNN,
    logMelFb,
    resolve,
)
from tpukaldi.models.quaternion import (
    hamilton_kernel,
    quaternion_linear_leanvjp,
)


def _init_apply(model, x, train=False):
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x,
        train=train,
    )
    out = model.apply(
        variables, x, train=train,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"] if train else False,
    )
    return (out[0] if train else out), variables


def test_cnn_shapes():
    opts = {
        "cnn_n_filt": "8,16",
        "cnn_len_filt": "32,5",
        "cnn_max_pool_len": "4,2",
        "cnn_act": "relu,relu",
        "cnn_drop": "0.1,0.1",
        "cnn_use_laynorm": "True,False",
        "cnn_use_batchnorm": "False,True",
        "cnn_use_laynorm_inp": "False",
        "cnn_use_batchnorm_inp": "False",
    }
    L = 400
    model = CNN(options=opts, inp_dim=L)
    # dims: (400-32+1)/4 = 92; (92-5+1)/2 = 44 -> out 44*16
    assert model.out_dim == 44 * 16
    x = jnp.asarray(np.random.default_rng(0).standard_normal((6, L)), jnp.float32)
    out, _ = _init_apply(model, x)
    assert out.shape == (6, model.out_dim)
    out_tr, variables = _init_apply(model, x, train=True)
    assert "batch_stats" in variables


def test_sincnet_shapes_and_bandpass():
    opts = {
        "sinc_n_filt": "16,8",
        "sinc_len_filt": "65,5",
        "sinc_max_pool_len": "4,2",
        "sinc_act": "relu,relu",
        "sinc_drop": "0.0,0.0",
        "sinc_use_laynorm": "False,False",
        "sinc_use_batchnorm": "False,False",
        "sinc_use_laynorm_inp": "False",
        "sinc_use_batchnorm_inp": "False",
        "sinc_sample_rate": "16000",
        "sinc_min_low_hz": "50",
        "sinc_min_band_hz": "50",
    }
    L = 400
    model = SincNet(options=opts, inp_dim=L)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, L)), jnp.float32)
    out, variables = _init_apply(model, x)
    assert out.shape == (4, model.out_dim)
    # learnable band params exist and are per-filter
    assert variables["params"]["low_hz"].shape == (16, 1)
    assert variables["params"]["band_hz"].shape == (16, 1)


def test_sinc_filters_are_bandpass():
    from tpukaldi.models.cnn import sinc_filters_fast

    low = jnp.full((4, 1), 100.0)
    band = jnp.full((4, 1), 400.0)
    filt = sinc_filters_fast(low, band, 101, 16000, 50, 50)
    assert filt.shape == (4, 101)
    # frequency response peaks inside the passband, low at DC
    H = np.abs(np.fft.rfft(np.asarray(filt[0]), n=1024))
    freqs = np.fft.rfftfreq(1024, 1 / 16000)
    # low = 50+100 = 150 Hz, high = 150+50+400 = 600 Hz
    inband = H[(freqs > 200) & (freqs < 500)].mean()
    stopband = H[freqs > 2000].mean()
    assert inband > 4 * H[0]  # DC suppressed
    assert inband > 10 * stopband  # far stopband strongly suppressed


def test_logmelfb():
    opts = {
        "logmelfb_nr_filt": "23",
        "logmelfb_stft_window_size": "320",
        "logmelfb_stft_window_shift": "160",
    }
    model = logMelFb(options=opts, inp_dim=1)
    assert model.out_dim == 23
    x = jnp.asarray(
        np.sin(np.linspace(0, 300, 3200))[:, None, None], jnp.float32
    ).repeat(2, axis=1)
    out, _ = _init_apply(model, x)
    n_frames = 1 + (3200 - 320) // 160
    assert out.shape == (n_frames, 2, 23)
    assert np.isfinite(np.asarray(out)).all()


def test_channel_averaging():
    opts = {"chavg_channelweights": "1.0,1.0,2.0"}
    model = channel_averaging(options=opts, inp_dim=3)
    x = jnp.ones((5, 2, 3))
    out, _ = _init_apply(model, x)
    assert out.shape == (5, 2, 1)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_quaternion_hamilton_product():
    """x @ K must equal the Hamilton product W (*) x on pure quaternions."""
    # 1x1 quaternion weight (a+bi+cj+dk), input quaternion (w+xi+yj+zk)
    a, b, c, d = 0.5, -1.0, 2.0, 0.25
    w, xx, y, z = 1.0, 0.5, -0.5, 2.0
    K = hamilton_kernel(*[jnp.full((1, 1), v) for v in (a, b, c, d)])
    out = jnp.asarray([[w, xx, y, z]]) @ K
    # quaternion multiplication q_w * q_x components
    expect = [
        a * w - b * xx - c * y - d * z,
        a * xx + b * w + c * z - d * y,
        a * y - b * z + c * w + d * xx,
        a * z + b * y - c * xx + d * w,
    ]
    np.testing.assert_allclose(np.asarray(out)[0], expect, rtol=1e-6)


def test_quaternion_lean_vjp_matches_autograd():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
    parts = [jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
             for _ in range(4)]

    def loss_lean(x, r, i, j, k):
        return jnp.sum(quaternion_linear_leanvjp(x, r, i, j, k) ** 2)

    def loss_auto(x, r, i, j, k):
        return jnp.sum((x @ hamilton_kernel(r, i, j, k)) ** 2)

    g1 = jax.grad(loss_lean, argnums=(0, 1, 2, 3, 4))(x, *parts)
    g2 = jax.grad(loss_auto, argnums=(0, 1, 2, 3, 4))(x, *parts)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


@pytest.mark.parametrize("autograd", ["True", "False"])
def test_qlstm(autograd):
    opts = {
        "lstm_lay": "16",
        "lstm_drop": "0.1",
        "lstm_bidir": "True",
        "lstm_act": "tanh",
        "quaternion_init": "quaternion",
        "autograd": autograd,
    }
    model = QLSTM(options=opts, inp_dim=8)
    assert model.out_dim == 32
    x = jnp.asarray(np.random.default_rng(3).standard_normal((10, 4, 8)),
                    jnp.float32)
    out, _ = _init_apply(model, x)
    assert out.shape == (10, 4, 32)
    out_tr, _ = _init_apply(model, x, train=True)
    assert np.isfinite(np.asarray(out_tr)).all()


def test_sru():
    opts = {
        "sru_hidden_size": "16",
        "sru_num_layers": "2",
        "sru_dropout": "0.1",
        "sru_rnn_dropout": "0.1",
        "sru_use_tanh": "True",
        "sru_use_relu": "False",
        "sru_use_selu": "False",
        "sru_weight_norm": "False",
        "sru_layer_norm": "True",
        "sru_bidirectional": "True",
        "sru_is_input_normalized": "False",
        "sru_has_skip_term": "True",
        "sru_rescale": "True",
        "sru_highway_bias": "-1.0",
        "sru_n_proj": "0",
    }
    model = SRU(options=opts, inp_dim=12)
    assert model.out_dim == 32
    x = jnp.asarray(np.random.default_rng(4).standard_normal((15, 3, 12)),
                    jnp.float32)
    out, _ = _init_apply(model, x)
    assert out.shape == (15, 3, 32)


@pytest.mark.parametrize("cls,gates", [(LSTM_cudnn, 4), (GRU_cudnn, 3),
                                       (RNN_cudnn, 1)])
def test_cudnn_like(cls, gates):
    opts = {
        "hidden_size": "16",
        "num_layers": "2",
        "bias": "True",
        "batch_first": "False",
        "dropout": "0.1",
        "bidirectional": "True",
        "nonlinearity": "relu",
    }
    model = cls(options=opts, inp_dim=10)
    assert model.out_dim == 32
    x = jnp.asarray(np.random.default_rng(5).standard_normal((12, 3, 10)),
                    jnp.float32)
    out, variables = _init_apply(model, x)
    assert out.shape == (12, 3, 32)
    assert variables["params"]["w_ih0"].shape == (2, 10, gates * 16)


def test_fusion_rnn():
    opts = {
        "fusionrnn_lay": "16,16",
        "fusionrnn_drop": "0.2,0.2",
        "fusionrnn_bidir": "True",
        "fusionrnn_act": "prelu,prelu",
        "fusionrnn_do_fusion": "True",
        "fusionrnn_fusion_layer_size": "96",
        "fusionrnn_number_of_mic": "6",
        "fusionrnn_fusion_act": "prelu",
        "fusionrnn_fusion_reduce": "sum",
        "batches": "4",
    }
    # 6 mics x 13 mfcc = 78-dim input
    model = fusionRNN(options=opts, inp_dim=78)
    x = jnp.asarray(np.random.default_rng(6).standard_normal((9, 4, 78)),
                    jnp.float32)
    out, _ = _init_apply(model, x, train=True)
    assert out.shape == (9, 4, 32)


def test_registry_has_all_reference_classes():
    for name in [
        "MLP", "LSTM", "GRU", "liGRU", "minimalGRU", "RNN", "CNN", "SincNet",
        "logMelFb", "channel_averaging", "LSTM_cudnn", "GRU_cudnn",
        "RNN_cudnn", "SRU", "QLSTM", "PASE", "fusionRNN_jit",
    ]:
        assert resolve(name) is not None


def test_input_and_layer_norms_coexist():
    """Input-level and layer-0 norms are distinct modules (reference has
    ln0/bn0 separate from per-layer ln[i]/bn_w*[i]); they previously
    collided on the flax param name."""
    import jax
    import jax.numpy as jnp
    from tpukaldi.models import MLP, liGRU

    opts = {
        "ligru_lay": "6", "ligru_drop": "0.0", "ligru_use_laynorm_inp": "True",
        "ligru_use_batchnorm_inp": "True", "ligru_use_laynorm": "True",
        "ligru_use_batchnorm": "False", "ligru_bidir": "False",
        "ligru_act": "tanh", "ligru_orthinit": "True",
    }
    m = liGRU(options=opts, inp_dim=5)
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               jnp.zeros((4, 2, 5)), train=True)
    assert {"ln_inp_gamma", "ln0_gamma"} <= set(v["params"])

    mo = {"dnn_lay": "6", "dnn_drop": "0.0", "dnn_use_laynorm_inp": "True",
          "dnn_use_batchnorm_inp": "True", "dnn_use_batchnorm": "True",
          "dnn_use_laynorm": "True", "dnn_act": "relu"}
    m2 = MLP(options=mo, inp_dim=5)
    v2 = m2.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 jnp.zeros((4, 5)), train=True)
    assert {"ln_inp", "ln0", "bn_inp", "bn0"} <= set(v2["params"])


def test_sru_skip_projection_active_when_dims_differ():
    """sru_has_skip_term must stay active when input dim != hidden via the
    learned projection block (the sru package's k=4 weight layout), and
    sru_highway_bias lands on the RESET gate bias (b_r), not the forget."""
    opts = {
        "sru_hidden_size": "16", "sru_num_layers": "1",
        "sru_dropout": "0.0", "sru_rnn_dropout": "0.0",
        "sru_use_tanh": "True", "sru_use_relu": "False",
        "sru_use_selu": "False", "sru_layer_norm": "False",
        "sru_bidirectional": "False", "sru_has_skip_term": "True",
        "sru_rescale": "False", "sru_highway_bias": "-2.0",
    }
    model = SRU(options=opts, inp_dim=12)  # 12 != 16 -> projection block
    x = jnp.asarray(np.random.default_rng(5).standard_normal((8, 2, 12)),
                    jnp.float32)
    out, variables = _init_apply(model, x)
    p = variables["params"]
    assert p["w0"].shape == (12, 4 * 16)  # 4th block = skip projection
    np.testing.assert_allclose(np.asarray(p["br0"]), -2.0)
    np.testing.assert_allclose(np.asarray(p["bf0"]), 0.0)
    # the skip term must actually contribute: zeroing the projection block
    # changes the output
    import flax

    p2 = flax.core.unfreeze(flax.core.freeze(p))
    w = np.array(p2["w0"])
    w[:, 3 * 16 :] = 0.0
    p2["w0"] = jnp.asarray(w)
    out2 = model.apply({"params": p2}, x, train=False)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-4


def test_quaternion_init_uses_experiment_seed():
    """QLSTM init must depend on the flax RNG (experiment seed): different
    seeds give different weights; the same seed reproduces them."""
    opts = {
        "lstm_lay": "16", "lstm_drop": "0.0", "lstm_bidir": "False",
        "lstm_act": "tanh", "quaternion_init": "quaternion",
        "autograd": "True",
    }
    model = QLSTM(options=opts, inp_dim=8)
    x = jnp.zeros((4, 2, 8), jnp.float32)
    v1 = model.init({"params": jax.random.key(0)}, x, train=False)
    v1b = model.init({"params": jax.random.key(0)}, x, train=False)
    v2 = model.init({"params": jax.random.key(1)}, x, train=False)
    l1 = jax.tree_util.tree_leaves(v1["params"])
    l1b = jax.tree_util.tree_leaves(v1b["params"])
    l2 = jax.tree_util.tree_leaves(v2["params"])
    assert all(np.array_equal(a, b) for a, b in zip(l1, l1b))
    assert any(not np.array_equal(a, b) for a, b in zip(l1, l2))


def test_cnn_input_normalization_applied():
    """{cnn,sinc}_use_laynorm_inp / _use_batchnorm_inp must actually apply
    (the raw-waveform recipes depend on per-window input LayerNorm,
    reference neural_networks.py:1491-1497,1536-1541)."""
    from tpukaldi.models import CNN

    base = {
        "cnn_n_filt": "8", "cnn_len_filt": "16", "cnn_max_pool_len": "2",
        "cnn_use_laynorm": "False", "cnn_use_batchnorm": "False",
        "cnn_act": "relu", "cnn_drop": "0.0",
        "cnn_use_laynorm_inp": "False", "cnn_use_batchnorm_inp": "False",
    }
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((6, 64)) * 5 + 3.0,
        jnp.float32,
    )
    plain = CNN(options=dict(base), inp_dim=64)
    vp = plain.init({"params": jax.random.key(0)}, x)
    normed = CNN(
        options=dict(base, cnn_use_laynorm_inp="True"), inp_dim=64
    )
    vn = normed.init({"params": jax.random.key(0)}, x)
    assert "ln_inp" in vn["params"], list(vn["params"])
    out_p = plain.apply(vp, x)
    # apply the normed model with the plain conv weights + fresh ln params
    out_n = normed.apply(vn, x)
    assert float(jnp.max(jnp.abs(out_p - out_n))) > 1e-3
    bn = CNN(options=dict(base, cnn_use_batchnorm_inp="True"), inp_dim=64)
    vb = bn.init({"params": jax.random.key(0)}, x)
    assert "batch_stats" in vb and "bn_inp" in vb["params"]
