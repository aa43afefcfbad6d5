"""Model-zoo tests: shapes/out_dim contracts and numerical parity of every
recurrent cell against a slow numpy implementation of the reference
equations (eval mode, bn off)."""

import math
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpukaldi.models import GRU, LSTM, MLP, RNN, liGRU, minimalGRU, resolve

T, B, D, H = 7, 4, 10, 8


def _opts_recurrent(prefix, bidir=False, bn=False, act="relu", drop=0.0):
    return {
        f"{prefix}_lay": str(H),
        f"{prefix}_drop": str(drop),
        f"{prefix}_use_laynorm_inp": "False",
        f"{prefix}_use_batchnorm_inp": "False",
        f"{prefix}_use_laynorm": "False",
        f"{prefix}_use_batchnorm": "True" if bn else "False",
        f"{prefix}_bidir": "True" if bidir else "False",
        f"{prefix}_act": act,
        f"{prefix}_orthinit": "True",
    }


def _init_apply(model_cls, opts, x, train=False):
    model = model_cls(options=opts, inp_dim=x.shape[-1])
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x,
        train=train,
    )
    out = model.apply(
        variables, x, train=train,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"] if train else False,
    )
    if train:
        out = out[0]
    return model, variables, out


def test_mlp_shapes_and_out_dim():
    opts = {
        "dnn_lay": "16,12",
        "dnn_drop": "0.0,0.0",
        "dnn_use_laynorm_inp": "False",
        "dnn_use_batchnorm_inp": "False",
        "dnn_use_batchnorm": "True,False",
        "dnn_use_laynorm": "False,False",
        "dnn_act": "relu,softmax",
    }
    x = jnp.ones((32, D))
    model, variables, out = _init_apply(MLP, opts, x)
    assert model.out_dim == 12
    assert out.shape == (32, 12)
    # log-softmax rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(np.array(out)).sum(-1), 1.0, rtol=5e-4)
    # train mode updates batch stats
    _, variables2, out_tr = _init_apply(MLP, opts, x, train=True)
    assert "batch_stats" in variables2


@pytest.mark.parametrize("cls", [liGRU, GRU, minimalGRU, RNN, LSTM])
@pytest.mark.parametrize("bidir", [False, True])
def test_recurrent_shapes(cls, bidir):
    opts = _opts_recurrent(cls.PREFIX, bidir=bidir)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((T, B, D)), jnp.float32)
    model, variables, out = _init_apply(cls, opts, x)
    want = H * (2 if bidir else 1)
    assert model.out_dim == want
    assert out.shape == (T, B, want)


def _params_of(variables, *names):
    p = variables["params"]
    return [np.array(p[n]) for n in names]


def _np_ligru(x, wh, wz, uh, uz, p=0.0):
    T_, B_, _ = x.shape
    H_ = uh.shape[0]
    h = np.zeros((B_, H_))
    outs = []
    for t in range(T_):
        wh_t = x[t] @ wh
        wz_t = x[t] @ wz
        zt = 1 / (1 + np.exp(-(wz_t + h @ uz)))
        hcand = np.maximum(wh_t + h @ uh, 0) * (1 - p)
        h = zt * h + (1 - zt) * hcand
        outs.append(h)
    return np.stack(outs)


def test_ligru_matches_reference_equations():
    # eval mode, biases enabled? use_bn False -> biases exist; zero them for
    # a clean comparison by reading them out of params
    opts = _opts_recurrent("ligru", drop=0.1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((T, B, D)), jnp.float32)
    model, variables, out = _init_apply(liGRU, opts, x)
    wh, wz, uh, uz, bh, bz = _params_of(variables, "wh0", "wz0", "uh0", "uz0", "bh0", "bz0")
    xn = np.array(x)
    # include biases in the numpy reference
    ref = _np_ligru_with_bias(xn, wh, wz, uh, uz, bh, bz, p=0.1)
    np.testing.assert_allclose(np.array(out), ref, rtol=2e-4, atol=2e-5)


def _np_ligru_with_bias(x, wh, wz, uh, uz, bh, bz, p=0.0):
    T_, B_, _ = x.shape
    H_ = uh.shape[0]
    h = np.zeros((B_, H_))
    outs = []
    for t in range(T_):
        zt = 1 / (1 + np.exp(-(x[t] @ wz + bz + h @ uz)))
        hcand = np.maximum(x[t] @ wh + bh + h @ uh, 0) * (1 - p)
        h = zt * h + (1 - zt) * hcand
        outs.append(h)
    return np.stack(outs)


def test_lstm_matches_reference_equations():
    opts = _opts_recurrent("lstm", act="tanh")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((T, B, D)), jnp.float32)
    model, variables, out = _init_apply(LSTM, opts, x)
    wf, wi, wo, wc = _params_of(variables, "wf0", "wi0", "wo0", "wc0")
    uf, ui, uo, uc = _params_of(variables, "uf0", "ui0", "uo0", "uc0")
    bf, bi, bo, bc = _params_of(variables, "bf0", "bi0", "bo0", "bc0")
    xn = np.array(x)
    h = np.zeros((B, H))
    c = np.zeros((B, H))
    sig = lambda v: 1 / (1 + np.exp(-v))
    outs = []
    for t in range(T):
        ft = sig(xn[t] @ wf + bf + h @ uf)
        it = sig(xn[t] @ wi + bi + h @ ui)
        ot = sig(xn[t] @ wo + bo + h @ uo)
        c = it * np.tanh(xn[t] @ wc + bc + h @ uc) + ft * c
        h = ot * np.tanh(c)
        outs.append(h)
    np.testing.assert_allclose(np.array(out), np.stack(outs), rtol=2e-4, atol=2e-5)


def test_gru_matches_reference_equations():
    opts = _opts_recurrent("gru", act="tanh")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((T, B, D)), jnp.float32)
    model, variables, out = _init_apply(GRU, opts, x)
    wh, wz, wr, uz, ur, uh = _params_of(variables, "wh0", "wz0", "wr0", "uz0", "ur0", "uh0")
    bh, bz, br = _params_of(variables, "bh0", "bz0", "br0")
    xn = np.array(x)
    h = np.zeros((B, H))
    sig = lambda v: 1 / (1 + np.exp(-v))
    outs = []
    for t in range(T):
        zt = sig(xn[t] @ wz + bz + h @ uz)
        rt = sig(xn[t] @ wr + br + h @ ur)
        at = xn[t] @ wh + bh + (rt * h) @ uh
        h = zt * h + (1 - zt) * np.tanh(at)
        outs.append(h)
    np.testing.assert_allclose(np.array(out), np.stack(outs), rtol=2e-4, atol=2e-5)


def test_bidir_is_forward_plus_reversed():
    """Bidir output's first half == unidir forward; second half == unidir
    over time-reversed input, re-reversed (the reference's flip-concat)."""
    opts_uni = _opts_recurrent("rnn", bidir=False, act="tanh")
    opts_bi = _opts_recurrent("rnn", bidir=True, act="tanh")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((T, B, D)), jnp.float32)
    model_bi = RNN(options=opts_bi, inp_dim=D)
    variables = model_bi.init({"params": jax.random.key(5)}, x, train=False)
    out_bi = model_bi.apply(variables, x, train=False)
    model_uni = RNN(options=opts_uni, inp_dim=D)
    out_f = model_uni.apply(variables, x, train=False)
    out_b = model_uni.apply(variables, jnp.flip(x, axis=0), train=False)
    np.testing.assert_allclose(np.array(out_bi[..., :H]), np.array(out_f), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.array(out_bi[..., H:]), np.array(jnp.flip(out_b, axis=0)), rtol=1e-5, atol=1e-6
    )


def test_train_mode_bn_and_dropout():
    opts = _opts_recurrent("ligru", bn=True, drop=0.2)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((T, B, D)), jnp.float32)
    model = liGRU(options=opts, inp_dim=D)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=True
    )
    assert "batch_stats" in variables
    out, updates = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert out.shape == (T, B, H)
    # running stats moved away from init
    ra_mean = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    assert np.abs(np.array(ra_mean)).sum() > 0


def test_registry_resolution():
    assert resolve("liGRU") is liGRU
    assert resolve("MLP") is MLP
    with pytest.raises(KeyError):
        resolve("NoSuchModel", "neural_networks")


def test_jit_compiles_once_per_shape():
    opts = _opts_recurrent("ligru")
    model = liGRU(options=opts, inp_dim=D)
    x = jnp.ones((T, B, D))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    out1 = fwd(variables, x)
    out2 = fwd(variables, x * 2)
    assert out1.shape == out2.shape


def test_remat_gradients_match():
    """ligru_remat=True: identical gradients, recomputed backward."""
    opts = _opts_recurrent("ligru", bidir=True)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((T, B, D)), jnp.float32)
    m1 = liGRU(options=opts, inp_dim=D)
    v = m1.init({"params": jax.random.key(0)}, x, train=False)
    m2 = liGRU(options={**opts, "ligru_remat": "True"}, inp_dim=D)

    def loss(m):
        return lambda p: jnp.sum(m.apply({"params": p}, x, train=False) ** 2)

    g1 = jax.grad(loss(m1))(v["params"])
    g2 = jax.grad(loss(m2))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cls_name", ["CNN", "SincNet"])
@pytest.mark.parametrize("impl", ["dot", "pallas"])
def test_conv_impl_dot_matches_xla(cls_name, impl, monkeypatch):
    """Every conv lowering — channels-last im2col/dot, the fused Pallas
    conv+pool layer-0 kernel (interpret mode off-TPU), and the NCH
    lax.conv path (TPUKALDI_CONV_IMPL=xla) — must agree numerically,
    including a non-divisible pool (floor/trim semantics) and the
    (filt, time) laynorm + batchnorm mix, with an identical param tree."""
    from tpukaldi.models import CNN, SincNet

    prefix = "cnn" if cls_name == "CNN" else "sinc"
    opts = {
        f"{prefix}_n_filt": "8,6",
        f"{prefix}_len_filt": "33,5",
        f"{prefix}_max_pool_len": "3,2",  # 468 % 3 == 0 fails -> trims tail
        f"{prefix}_act": "relu,relu",
        f"{prefix}_drop": "0.0,0.0",
        f"{prefix}_use_laynorm": "True,False",
        f"{prefix}_use_batchnorm": "False,True",
        f"{prefix}_use_laynorm_inp": "True",
        f"{prefix}_use_batchnorm_inp": "False",
    }
    if cls_name == "SincNet":
        opts.update({
            "sinc_sample_rate": "16000", "sinc_min_low_hz": "50",
            "sinc_min_band_hz": "50", "sinc_fast": "False",
        })
    cls = CNN if cls_name == "CNN" else SincNet
    model = cls(options=opts, inp_dim=500)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 500)), jnp.float32)

    monkeypatch.setenv("TPUKALDI_CONV_IMPL", impl)
    v_dot = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                       x, train=True)
    out_dot = model.apply(v_dot, x, train=False)

    monkeypatch.setenv("TPUKALDI_CONV_IMPL", "xla")
    v_xla = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                       x, train=True)
    out_xla = model.apply(v_xla, x, train=False)

    assert jax.tree_util.tree_structure(v_dot) == jax.tree_util.tree_structure(v_xla)
    for a, b in zip(jax.tree_util.tree_leaves(v_dot),
                    jax.tree_util.tree_leaves(v_xla)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert out_dot.shape == (4, model.out_dim)
    np.testing.assert_allclose(np.asarray(out_dot), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-5)

    # gradients agree too (the training path is what the bench measures)
    def loss(model, v):
        return lambda p: jnp.sum(
            model.apply({**v, "params": p}, x, train=False) ** 2)

    monkeypatch.setenv("TPUKALDI_CONV_IMPL", impl)
    g_dot = jax.grad(loss(model, v_dot))(v_dot["params"])
    monkeypatch.setenv("TPUKALDI_CONV_IMPL", "xla")
    g_xla = jax.grad(loss(model, v_xla))(v_xla["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_dot),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fast_dropout_semantics(monkeypatch):
    """FastDropout (models/common.py): torch nn.Dropout semantics — at
    train, elements are zeroed i.i.d. with prob `rate` and survivors are
    scaled by 1/keep; identity at eval; deterministic per RNG key.  The
    16-bit threshold masks must match that distribution (keep-prob
    quantization <= 8e-6) for every split-axis geometry, including the
    odd-all-axes bernoulli fallback and the TPUKALDI_DROPOUT_BITS=0 knob."""
    from tpukaldi.models.common import FastDropout

    rate = 0.15
    for shape in [(64, 1024), (8, 1024, 128), (33, 33, 64), (7, 9, 11)]:
        x = jnp.ones(shape, jnp.float32)
        mod = FastDropout(rate=rate, deterministic=False)
        y = mod.apply({}, x, rngs={"dropout": jax.random.key(5)})
        ya = np.asarray(y)
        # exactly {0, 1/keep}
        assert np.all((ya == 0) | np.isclose(ya, 1.0 / (1.0 - rate), rtol=1e-6))
        keep_frac = float((np.asarray(y) != 0).mean())
        n = x.size
        # 6-sigma band around the keep probability
        sigma = math.sqrt(rate * (1 - rate) / n)
        assert abs(keep_frac - (1.0 - rate)) < 6 * sigma + 1e-4, (shape, keep_frac)
        # deterministic per key
        y2 = mod.apply({}, x, rngs={"dropout": jax.random.key(5)})
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    # eval identity, rate-0 identity
    x = jnp.ones((16, 32), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(FastDropout(rate=rate, deterministic=True).apply({}, x)), 1.0)
    np.testing.assert_array_equal(
        np.asarray(FastDropout(rate=0.0, deterministic=False).apply(
            {}, x, rngs={"dropout": jax.random.key(0)})), 1.0)
    # A/B knob restores the flax path
    monkeypatch.setenv("TPUKALDI_DROPOUT_BITS", "0")
    y = np.asarray(FastDropout(rate=rate, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.key(1)}))
    assert np.all((y == 0) | np.isclose(y, 1.0 / (1.0 - rate), rtol=1e-6))


def test_sincnet_fused_ln0_path_matches_xla(monkeypatch):
    """The fused conv+pool+bias+laynorm+relu layer-0 dispatch
    (models/cnn.py fuse_ln0, engaged at recipe-like geometry: 128
    filters, K=129, laynorm-no-batchnorm, relu) must agree with the
    pure-XLA lowering on outputs and parameter gradients with an
    identical param tree — the dispatch is a lowering choice, never a
    semantic one."""
    from tpukaldi.models import SincNet

    opts = {
        "sinc_n_filt": "128,4", "sinc_len_filt": "129,5",
        "sinc_max_pool_len": "3,2", "sinc_sample_rate": "16000",
        "sinc_min_low_hz": "50", "sinc_min_band_hz": "50",
        "sinc_use_laynorm_inp": "True", "sinc_use_batchnorm_inp": "False",
        "sinc_use_laynorm": "True,True", "sinc_use_batchnorm": "False,False",
        "sinc_act": "relu,relu", "sinc_drop": "0.0,0.0",
    }
    model = SincNet(options=opts, inp_dim=512)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((5, 512)), jnp.float32)

    outs, grads, trees = {}, {}, {}
    for impl in ("pallas", "xla"):
        monkeypatch.setenv("TPUKALDI_CONV_IMPL", impl)
        v = model.init({"params": jax.random.key(0),
                        "dropout": jax.random.key(1)}, x, train=True)
        trees[impl] = jax.tree_util.tree_structure(v)
        outs[impl] = model.apply(v, x, train=False)

        def loss(p, v=v):
            return jnp.sum(model.apply({**v, "params": p}, x,
                                       train=False) ** 2)

        grads[impl] = jax.grad(loss)(v["params"])

    assert trees["pallas"] == trees["xla"]
    np.testing.assert_allclose(np.asarray(outs["pallas"]),
                               np.asarray(outs["xla"]),
                               rtol=1e-4, atol=1e-5)
    key = lambda t: str(t[0])
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(grads["pallas"]),
                   key=key),
            sorted(jax.tree_util.tree_leaves_with_path(grads["xla"]),
                   key=key)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=str(pa))
