"""Pallas Li-GRU kernel tests (interpret mode on CPU): forward parity vs
the pure-scan reference, custom-VJP gradients vs autodiff, and the model
integration path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpukaldi.kernels.ligru import (
    ligru_recurrence,
    ligru_recurrence_scan,
)

T, B, H = 21, 4, 8  # T deliberately not a multiple of TIME_BLOCK


def _inputs(seed=0, mask_p=0.0):
    rng = np.random.default_rng(seed)
    ff = jnp.asarray(rng.standard_normal((T, B, 2 * H)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((H, 2 * H)) * 0.3, jnp.float32)
    if mask_p > 0:
        mask = jnp.asarray(
            rng.random((B, H)) > mask_p, jnp.float32
        )
    else:
        mask = jnp.ones((B, H), jnp.float32)
    return ff, u, mask


def test_forward_parity():
    ff, u, mask = _inputs(0)
    h_scan = ligru_recurrence_scan(ff, u, mask)
    h_pallas = ligru_recurrence(ff, u, mask, True)  # interpret mode
    np.testing.assert_allclose(
        np.asarray(h_pallas), np.asarray(h_scan), rtol=1e-5, atol=1e-5
    )


def test_forward_parity_with_dropout_mask():
    ff, u, mask = _inputs(1, mask_p=0.3)
    h_scan = ligru_recurrence_scan(ff, u, mask)
    h_pallas = ligru_recurrence(ff, u, mask, True)
    np.testing.assert_allclose(
        np.asarray(h_pallas), np.asarray(h_scan), rtol=1e-5, atol=1e-5
    )


def test_custom_vjp_matches_autodiff():
    ff, u, mask = _inputs(2, mask_p=0.2)

    def loss_pallas(ff, u, mask):
        h = ligru_recurrence(ff, u, mask, True)
        return jnp.sum(jnp.sin(h))

    def loss_scan(ff, u, mask):
        h = ligru_recurrence_scan(ff, u, mask)
        return jnp.sum(jnp.sin(h))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(ff, u, mask)
    g2 = jax.grad(loss_scan, argnums=(0, 1, 2))(ff, u, mask)
    for a, b, name in zip(g1, g2, ("dff", "du", "dmask")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_model_pallas_impl_matches_scan():
    from tpukaldi.models import liGRU

    base_opts = {
        "ligru_lay": "8", "ligru_drop": "0.0",
        "ligru_use_laynorm_inp": "False", "ligru_use_batchnorm_inp": "False",
        "ligru_use_laynorm": "False", "ligru_use_batchnorm": "False",
        "ligru_bidir": "True", "ligru_act": "relu", "ligru_orthinit": "True",
    }
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((T, B, 6)), jnp.float32)
    m_scan = liGRU(options={**base_opts, "ligru_impl": "scan"}, inp_dim=6)
    v = m_scan.init({"params": jax.random.key(0)}, x, train=False)
    out_scan = m_scan.apply(v, x, train=False)
    m_pallas = liGRU(options={**base_opts, "ligru_impl": "pallas"}, inp_dim=6)
    out_pallas = m_pallas.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_scan), rtol=1e-5, atol=1e-5
    )


def test_model_pallas_impl_gradients():
    from tpukaldi.models import liGRU

    opts = {
        "ligru_lay": "8", "ligru_drop": "0.0",
        "ligru_use_laynorm_inp": "False", "ligru_use_batchnorm_inp": "False",
        "ligru_use_laynorm": "False", "ligru_use_batchnorm": "True",
        "ligru_bidir": "False", "ligru_act": "relu", "ligru_orthinit": "True",
        "ligru_impl": "pallas",
    }
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((T, B, 6)), jnp.float32)
    model = liGRU(options=opts, inp_dim=6)
    v = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x,
        train=True,
    )

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats"],
        )
        return jnp.mean(out**2)

    g = jax.grad(loss)(v["params"])
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_lstm_kernel_forward_parity():
    from tpukaldi.kernels.lstm import lstm_recurrence, lstm_recurrence_scan

    rng = np.random.default_rng(5)
    ff = jnp.asarray(rng.standard_normal((T, B, 4 * H)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.3, jnp.float32)
    mask = jnp.asarray(rng.random((B, H)) > 0.2, jnp.float32)
    h_scan = lstm_recurrence_scan(ff, u, mask)
    h_pallas = lstm_recurrence(ff, u, mask, True)
    np.testing.assert_allclose(
        np.asarray(h_pallas), np.asarray(h_scan), rtol=1e-5, atol=1e-5
    )


def test_lstm_kernel_vjp_parity():
    from tpukaldi.kernels.lstm import lstm_recurrence, lstm_recurrence_scan

    rng = np.random.default_rng(6)
    ff = jnp.asarray(rng.standard_normal((T, B, 4 * H)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.3, jnp.float32)
    mask = jnp.asarray(rng.random((B, H)) > 0.2, jnp.float32)

    g1 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(lstm_recurrence(*a, True))), argnums=(0, 1, 2)
    )(ff, u, mask)
    g2 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(lstm_recurrence_scan(*a))), argnums=(0, 1, 2)
    )(ff, u, mask)
    for a, b, name in zip(g1, g2, ("dff", "du", "dmask")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5, err_msg=name
        )


def test_lstm_model_pallas_impl_matches_scan():
    from tpukaldi.models import LSTM

    base = {
        "lstm_lay": "8", "lstm_drop": "0.0",
        "lstm_use_laynorm_inp": "False", "lstm_use_batchnorm_inp": "False",
        "lstm_use_laynorm": "False", "lstm_use_batchnorm": "False",
        "lstm_bidir": "True", "lstm_act": "tanh", "lstm_orthinit": "True",
    }
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((T, B, 6)), jnp.float32)
    m_scan = LSTM(options={**base, "lstm_impl": "scan"}, inp_dim=6)
    v = m_scan.init({"params": jax.random.key(0)}, x, train=False)
    out_scan = m_scan.apply(v, x, train=False)
    m_pallas = LSTM(options={**base, "lstm_impl": "pallas"}, inp_dim=6)
    out_pallas = m_pallas.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_scan), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("act", ["relu", "tanh"])
def test_gru_kernel_forward_and_vjp_parity(act):
    from tpukaldi.kernels.gru import gru_recurrence, gru_recurrence_scan

    rng = np.random.default_rng(8)
    ff = jnp.asarray(rng.standard_normal((T, B, 3 * H)), jnp.float32)
    uzr = jnp.asarray(rng.standard_normal((H, 2 * H)) * 0.3, jnp.float32)
    uh = jnp.asarray(rng.standard_normal((H, H)) * 0.3, jnp.float32)
    mask = jnp.asarray(rng.random((B, H)) > 0.2, jnp.float32)
    h1 = gru_recurrence(ff, uzr, uh, mask, act, True)
    h2 = gru_recurrence_scan(ff, uzr, uh, mask, act)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5,
                               atol=1e-5)
    g1 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(gru_recurrence(*a, act, True))),
        argnums=(0, 1, 2, 3),
    )(ff, uzr, uh, mask)
    g2 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(gru_recurrence_scan(*a, act))),
        argnums=(0, 1, 2, 3),
    )(ff, uzr, uh, mask)
    for a_, b_, name in zip(g1, g2, ("dff", "duzr", "duh", "dmask")):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=3e-4,
                                   atol=3e-5, err_msg=name)


def test_gru_model_pallas_impl_matches_scan():
    from tpukaldi.models import GRU

    base = {
        "gru_lay": "8", "gru_drop": "0.0",
        "gru_use_laynorm_inp": "False", "gru_use_batchnorm_inp": "False",
        "gru_use_laynorm": "False", "gru_use_batchnorm": "False",
        "gru_bidir": "True", "gru_act": "relu", "gru_orthinit": "True",
    }
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((T, B, 6)), jnp.float32)
    m_scan = GRU(options={**base, "gru_impl": "scan"}, inp_dim=6)
    v = m_scan.init({"params": jax.random.key(0)}, x, train=False)
    out_scan = m_scan.apply(v, x, train=False)
    m_pallas = GRU(options={**base, "gru_impl": "pallas"}, inp_dim=6)
    out_pallas = m_pallas.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_scan), rtol=1e-5, atol=1e-5
    )


def test_fused_pallas_backward_matches_scan_backward():
    """The fused reverse-streamed pallas backward produces the same
    (dff, du, dmask) as the hoisted scan backward it replaced."""
    from tpukaldi.kernels.ligru import _bwd, _bwd_scan, _fwd

    ff, u, mask = _inputs(5, mask_p=0.25)
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.standard_normal((T, B, H)), jnp.float32)
    _, res = _fwd(ff, u, mask, True)
    d_pallas = _bwd(True, res, g)
    d_scan = _bwd_scan(True, res, g)
    for name, a, b in zip(("dff", "du", "dmask"), d_pallas, d_scan):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


def test_lstm_fused_backward_matches_scan_backward():
    """Same fused-vs-scan contract for the LSTM backward (kernels/lstm.py
    _lstm_bwd_kernel), including a T not divisible by TIME_BLOCK_BWD so
    the reverse-order zero-padding path is exercised."""
    from tpukaldi.kernels.lstm import _bwd, _bwd_scan, _fwd, _bwd_fits_vmem

    rng = np.random.default_rng(11)
    ff = jnp.asarray(rng.standard_normal((T, B, 4 * H)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.3, jnp.float32)
    mask = jnp.asarray(rng.random((B, H)) > 0.2, jnp.float32)
    g = jnp.asarray(rng.standard_normal((T, B, H)), jnp.float32)
    assert _bwd_fits_vmem(B, H)  # the fused path is what runs below
    _, res = _fwd(ff, u, mask, True)
    d_pallas = _bwd(True, res, g)
    d_scan = _bwd_scan(True, res, g)
    for name, a, b in zip(("dff", "du", "dmask"), d_pallas, d_scan):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )
    # large H falls back to the scan backward instead of overflowing VMEM
    assert not _bwd_fits_vmem(16, 1024)


@pytest.mark.parametrize("act", ["relu", "tanh"])
def test_gru_fused_backward_matches_scan_backward(act):
    """Fused-vs-scan contract for the GRU backward (kernels/gru.py
    _gru_bwd_kernel), T not divisible by TIME_BLOCK_BWD."""
    from tpukaldi.kernels.gru import _bwd, _bwd_scan, _fwd, _bwd_fits_vmem

    rng = np.random.default_rng(13)
    ff = jnp.asarray(rng.standard_normal((T, B, 3 * H)), jnp.float32)
    uzr = jnp.asarray(rng.standard_normal((H, 2 * H)) * 0.3, jnp.float32)
    uh = jnp.asarray(rng.standard_normal((H, H)) * 0.3, jnp.float32)
    mask = jnp.asarray(rng.random((B, H)) > 0.2, jnp.float32)
    g = jnp.asarray(rng.standard_normal((T, B, H)), jnp.float32)
    assert _bwd_fits_vmem(B, H)
    _, res = _fwd(ff, uzr, uh, mask, act, True)
    d_pallas = _bwd(act, True, res, g)
    d_scan = _bwd_scan(act, True, res, g)
    for name, a, b in zip(("dff", "duzr", "duh", "dmask"), d_pallas, d_scan):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )
    assert not _bwd_fits_vmem(16, 1200)


@pytest.mark.parametrize("shape", [
    (4, 3200, 129, 128, 3),   # TIMIT_SincNet_raw layer-0 shape (scaled N)
    (2, 400, 129, 128, 3),    # the CPU-side parity-tree raw windows
    (3, 500, 40, 64, 2),      # generic CNN layer-0, K < 128
    (2, 260, 7, 16, 5),       # tiny kernel, non-divisible pool tail
])
def test_conv1d_pool_kernel_matches_xla(shape):
    """Fused conv+max-pool kernel (kernels/conv1d.py) vs the XLA NHC conv
    + torch-pool reference: outputs and BOTH gradients (dW through the
    reversed-tap patch construction + tail pass; dX through the
    anti-diagonal rotate) in interpreter mode at 'highest' precision."""
    from tpukaldi.kernels.conv1d import conv1d_pool

    N, L, K, O, pool = shape

    def ref(x, w):
        y = jax.lax.conv_general_dilated(
            x[:, :, None], w[:, None, :], window_strides=(1,),
            padding="VALID", dimension_numbers=("NHC", "HIO", "NHC"))
        Lp = y.shape[1] // pool
        return y[:, :Lp * pool, :].reshape(N, Lp, pool, O).max(axis=2)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, L)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, O)) * 0.1, jnp.float32)
    y_k = conv1d_pool(x, w, pool, True, "highest")
    y_r = ref(x, w)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)

    def loss_k(x, w):
        return (conv1d_pool(x, w, pool, True, "highest") * 0.001).sum()

    def loss_r(x, w):
        return (ref(x, w) * 0.001).sum()

    gxk, gwk = jax.grad(loss_k, argnums=(0, 1))(x, w)
    gxr, gwr = jax.grad(loss_r, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gwk), np.asarray(gwr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gxk), np.asarray(gxr),
                               rtol=1e-4, atol=1e-5)


def test_conv1d_pool_auto_dispatch_shape_gate():
    """Auto dispatch must route only Mosaic-supported layer-0 shapes to
    the fused kernel: O has to be a 128-lane multiple (the pool
    row-merge reshape is rejected otherwise — caught by the round-4
    TPU e2e drive at O=16) and K <= 129.  Recipe shapes (K=129, O=128)
    stay on the kernel."""
    from tpukaldi.kernels.conv1d import kernel_supported

    assert kernel_supported(129, 128)       # TIMIT_SincNet_raw / CNN_raw
    assert kernel_supported(40, 256)
    assert not kernel_supported(129, 16)    # synth e2e layer-0
    assert not kernel_supported(129, 60)
    assert not kernel_supported(251, 128)   # K beyond the 1-pass+tail max
    assert not kernel_supported(0, 128)


def _composed_conv_pool_ln(x, w, bias, gt, bt, pool, eps, relu):
    N, L = x.shape
    K, O = w.shape
    y = jax.lax.conv_general_dilated(
        x[:, :, None], w[:, None, :], (1,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))
    M = (L - K + 1) // pool
    y = y[:, : M * pool, :].reshape(N, M, pool, O).max(axis=2)
    y = y + bias[None, None, :]
    mean = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.sum((y - mean) ** 2, axis=1, keepdims=True) / max(M - 1, 1)
    z = gt[None] * (y - mean) / (jnp.sqrt(var) + eps) + bt[None]
    return jnp.maximum(z, 0.0) if relu else z


@pytest.mark.parametrize("shape", [
    (5, 640, 129, 128, 2),   # K=129 tail-tap geometry (recipe K)
    (3, 423, 40, 128, 3),    # K < 128, odd batch (grid padding windows)
])
@pytest.mark.parametrize("relu", [True, False])
def test_conv1d_pool_ln_act_matches_composed(shape, relu):
    """Fused layer-0 chain (kernels/conv1d.py conv1d_pool_ln_act):
    conv+pool+bias+time-moment laynorm (reference unbiased-std +
    eps-on-std quirk)+act vs the composed XLA reference — outputs and
    ALL five gradients (dX through the laynorm backward and the
    anti-diagonal rotate; dW; dbias ~0 by mean-cancellation; dgamma;
    dbeta), interpreter mode at 'highest' precision."""
    from tpukaldi.kernels.conv1d import (conv1d_pool_ln_act,
                                         fused_ln_supported)

    N, L, K, O, pool = shape
    M = (L - K + 1) // pool
    assert fused_ln_supported(K, O, L, pool)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, L)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, O)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((O,)) * 0.1, jnp.float32)
    gt = jnp.asarray(1.0 + 0.2 * rng.standard_normal((M, O)), jnp.float32)
    bt = jnp.asarray(0.1 * rng.standard_normal((M, O)), jnp.float32)
    proj = jnp.asarray(rng.standard_normal((N, M, O)), jnp.float32)

    out_k = conv1d_pool_ln_act(x, w, bias, gt, bt, 0, pool, 1e-6, relu,
                               0.0, True, "highest")
    out_r = _composed_conv_pool_ln(x, w, bias, gt, bt, pool, 1e-6, relu)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-4, atol=2e-5)

    def loss_k(*a):
        return (conv1d_pool_ln_act(*a, 0, pool, 1e-6, relu, 0.0, True,
                                   "highest") * proj).sum()

    def loss_r(*a):
        return (_composed_conv_pool_ln(*a, pool, 1e-6, relu) * proj).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, w, bias, gt, bt)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, w, bias, gt, bt)
    for name, a, b in zip("x w bias gt bt".split(), gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_xla_composed_backward_matches_pallas_grads():
    """TPUKALDI_CONV_BWD=xla composes the layer-0 backward from jax.vjp of
    the XLA reference forward; its gradients must match the hand-written
    Pallas backward (interpret mode) to float rounding."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpukaldi.kernels import conv1d as c1

    rng = np.random.default_rng(3)
    N, L, K, O, P = 4, 512, 129, 128, 3
    x = jnp.asarray(rng.standard_normal((N, L)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, O)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((O,)) * 0.1, jnp.float32)
    M = (L - K + 1) // P
    gt = jnp.asarray(rng.standard_normal((M, O)) * 0.5 + 1.0, jnp.float32)
    bt = jnp.asarray(rng.standard_normal((M, O)) * 0.1, jnp.float32)

    def f_pallas(x, w, gt, bt):
        return (c1.conv1d_pool_ln_act(
            x, w, b, gt, bt, 0, P, 1e-5, True, 0.0, True,
            "highest") ** 2).sum()

    def f_ref(x, w, gt, bt):
        return (c1._xla_conv_pool_ln_act(
            x, w, b, gt, bt, P, 1e-5, True, "highest") ** 2).sum()

    # the reference forward itself must match the kernel forward
    np.testing.assert_allclose(
        np.asarray(c1.conv1d_pool_ln_act(x, w, b, gt, bt, 0, P, 1e-5,
                                         True, 0.0, True, "highest")),
        np.asarray(c1._xla_conv_pool_ln_act(x, w, b, gt, bt, P, 1e-5, True,
                                            "highest")),
        rtol=1e-5, atol=1e-5)
    gp = jax.grad(f_pallas, argnums=(0, 1, 2, 3))(x, w, gt, bt)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, w, gt, bt)
    for a, b_ in zip(gp, gr):
        scale = max(float(jnp.abs(b_).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b_) / scale,
                                   rtol=2e-4, atol=2e-4)

    # plain conv+pool variant
    def g_pallas(x, w):
        return (c1.conv1d_pool(x, w, P, True, "highest") ** 2).sum()

    def g_ref(x, w):
        return (c1._xla_conv_pool(x, w, P, "highest") ** 2).sum()

    gp = jax.grad(g_pallas, argnums=(0, 1))(x, w)
    gr = jax.grad(g_ref, argnums=(0, 1))(x, w)
    for a, b_ in zip(gp, gr):
        scale = max(float(jnp.abs(b_).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b_) / scale,
                                   rtol=2e-4, atol=2e-4)


def test_fused_dropout_mask_and_grads():
    """conv1d_pool_ln_act with a fused dropout rate: (a) nonzero outputs
    equal the no-drop reference scaled by 1/keep and the drop fraction is
    ~rate, (b) the backward regenerates the identical mask — gradients
    match jax.grad of the composed XLA chain with that mask applied
    (relu=False so out==0 identifies dropped elements exactly)."""
    from tpukaldi.kernels import conv1d as c1

    rng = np.random.default_rng(11)
    N, L, K, O, pool = 4, 512, 129, 128, 3
    M = (L - K + 1) // pool
    rate, keep = 0.25, 0.75
    x = jnp.asarray(rng.standard_normal((N, L)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, O)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((O,)) * 0.1, jnp.float32)
    gt = jnp.asarray(1.0 + 0.2 * rng.standard_normal((M, O)), jnp.float32)
    bt = jnp.asarray(0.1 * rng.standard_normal((M, O)), jnp.float32)
    proj = jnp.asarray(rng.standard_normal((N, M, O)), jnp.float32)
    seed = jnp.asarray(12345, jnp.int32)

    out_d = c1.conv1d_pool_ln_act(x, w, b, gt, bt, seed, pool, 1e-5,
                                  False, rate, True, "highest")
    out_r = c1._xla_conv_pool_ln_act(x, w, b, gt, bt, pool, 1e-5, False,
                                     "highest")
    mask = np.asarray(out_d) != 0.0
    frac = 1.0 - mask.mean()
    assert abs(frac - rate) < 0.01, frac
    np.testing.assert_allclose(
        np.asarray(out_d)[mask],
        (np.asarray(out_r) * np.float32(1.0 / keep))[mask],
        rtol=2e-5, atol=2e-6)
    # same seed -> same mask; different seed -> different mask
    out_d2 = c1.conv1d_pool_ln_act(x, w, b, gt, bt, seed, pool, 1e-5,
                                   False, rate, True, "highest")
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_d2))
    out_d3 = c1.conv1d_pool_ln_act(x, w, b, gt, bt, seed + 1, pool, 1e-5,
                                   False, rate, True, "highest")
    assert (np.asarray(out_d3) != np.asarray(out_d)).any()

    mj = jnp.asarray(mask, jnp.float32) / keep

    def loss_k(x, w, gt, bt):
        return (c1.conv1d_pool_ln_act(x, w, b, gt, bt, seed, pool, 1e-5,
                                      False, rate, True, "highest")
                * proj).sum()

    def loss_r(x, w, gt, bt):
        return (c1._xla_conv_pool_ln_act(x, w, b, gt, bt, pool, 1e-5,
                                         False, "highest") * mj
                * proj).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, w, gt, bt)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, w, gt, bt)
    for name, a, bb in zip("x w gt bt".split(), gk, gr):
        scale = max(float(jnp.abs(bb).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(bb) / scale,
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_lstm_lean_kernel_forward_matches_bf16_product_scan():
    """Resident-bf16-U lean LSTM kernel (kernels/lstm.py lean section):
    forward must equal a scan whose operands are rounded to bf16 before
    each recurrent matmul — the products XLA's DEFAULT TPU matmul
    precision performs.  In interpret mode bf16 x bf16 products are exact
    in f32, so the comparison is tight."""
    from tpukaldi.kernels.lstm import lstm_recurrence_lean

    rng = np.random.default_rng(17)
    ff = jnp.asarray(rng.standard_normal((T, B, 4 * H)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.3, jnp.float32)
    mask = jnp.asarray(rng.random((B, H)) > 0.2, jnp.float32)
    ub = u.astype(jnp.bfloat16).astype(jnp.float32)

    def scan_bf16(ff, u, mask):
        Hh = ff.shape[-1] // 4

        def step(state, ff_t):
            h, c = state
            r = h.astype(jnp.bfloat16).astype(jnp.float32) @ u
            f = jax.nn.sigmoid(ff_t[:, :Hh] + r[:, :Hh])
            i = jax.nn.sigmoid(ff_t[:, Hh:2 * Hh] + r[:, Hh:2 * Hh])
            o = jax.nn.sigmoid(ff_t[:, 2 * Hh:3 * Hh] + r[:, 2 * Hh:3 * Hh])
            cand = jnp.tanh(ff_t[:, 3 * Hh:] + r[:, 3 * Hh:])
            c = i * cand * mask + f * c
            h = o * jnp.tanh(c)
            return (h, c), h

        z = jnp.zeros((ff.shape[1], Hh), ff.dtype)
        _, h = jax.lax.scan(step, (z, z), ff)
        return h

    h_lean = lstm_recurrence_lean(ff, u, mask, True)
    h_ref = scan_bf16(ff, ub, mask)
    np.testing.assert_allclose(np.asarray(h_lean), np.asarray(h_ref),
                               rtol=1e-6, atol=1e-6)


def test_lstm_lean_kernel_vjp_close_to_f32_scan():
    """Lean-kernel gradients vs the full-f32 scan: the only deltas are
    bf16 rounding of U / h / dA at the matmuls (DEFAULT-precision-family
    arithmetic), so relative agreement at ~1e-2 is the contract."""
    from tpukaldi.kernels.lstm import lstm_recurrence_lean, \
        lstm_recurrence_scan

    rng = np.random.default_rng(19)
    ff = jnp.asarray(rng.standard_normal((T, B, 4 * H)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.3, jnp.float32)
    mask = jnp.asarray(rng.random((B, H)) > 0.2, jnp.float32)

    g_lean = jax.grad(
        lambda *a: jnp.sum(jnp.sin(lstm_recurrence_lean(*a, True))),
        argnums=(0, 1, 2))(ff, u, mask)
    g_scan = jax.grad(
        lambda *a: jnp.sum(jnp.sin(lstm_recurrence_scan(*a))),
        argnums=(0, 1, 2))(ff, u, mask)
    for name, a, b in zip(("dff", "du", "dmask"), g_lean, g_scan):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=1e-2, atol=1e-2, err_msg=name)


def test_lean_vmem_budget_and_recipe_fit():
    """The QLSTM recipe shape (Bp=32 after bidir flip-concat, H=1024) must
    ride the lean kernel — its f32 U (16 MB) is past the VMEM core but the
    bf16 U (8 MB) fits; absurd shapes must still fall back."""
    from tpukaldi.kernels.lstm import _bwd_fits_vmem, lean_fits_vmem

    assert not _bwd_fits_vmem(32, 1024)  # why the lean variant exists
    assert lean_fits_vmem(32, 1024)
    assert lean_fits_vmem(16, 1024)
    assert not lean_fits_vmem(32, 4096)


def test_qlstm_fused_dispatch_matches_scan():
    """QLSTM model output through the fused lean path (qlstm_impl=pallas,
    interpret mode) vs the lax.scan Hamilton path (qlstm_impl=scan): the
    recurrence is the same cell, so eval-mode outputs agree to bf16-product
    rounding."""
    from tpukaldi.models.quaternion import QLSTM

    base = {
        "lstm_lay": "16", "lstm_drop": "0.0", "lstm_bidir": "True",
        "lstm_act": "tanh", "quaternion_init": "quaternion",
        "autograd": "False",
    }
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((T, B, 8)), jnp.float32)
    m_scan = QLSTM(options={**base, "qlstm_impl": "scan"}, inp_dim=8)
    v = m_scan.init({"params": jax.random.key(0)}, x, train=False)
    m_pallas = QLSTM(options={**base, "qlstm_impl": "pallas"}, inp_dim=8)
    y_scan = m_scan.apply(v, x, train=False)
    y_pallas = m_pallas.apply(v, x, train=False)
    assert y_pallas.shape == y_scan.shape == (T, B, 32)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_scan),
                               rtol=5e-3, atol=5e-3)
