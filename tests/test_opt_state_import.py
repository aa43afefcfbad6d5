"""Torch optimizer-state import (compat.torch_import.import_optimizer_par).

The reference restores `optimizer_par` on every pretrain load (core.py:532),
so a mid-training migration must carry the rmsprop/adam/momentum moments —
not just the weights — for the trajectory to continue where torch left off.
Moments transform exactly like their weights (transpose, per-gate fusion),
which these tests verify tensor-by-tensor against live torch optimizers.
"""

import os
import sys

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

from tpukaldi.compat.torch_import import (  # noqa: E402
    import_model_par,
    import_optimizer_par,
)

D_IN, D_OUT = 7, 5


def _mlp_and_opt(opt_factory, steps=3):
    opts = {
        "dnn_lay": f"6,{D_OUT}",
        "dnn_drop": "0.0,0.0",
        "dnn_use_laynorm_inp": "False",
        "dnn_use_batchnorm_inp": "False",
        "dnn_use_batchnorm": "True,False",
        "dnn_use_laynorm": "False,False",
        "dnn_act": "relu,softmax",
        "use_cuda": "False",
        "to_do": "train",
    }
    net = ref_nn.MLP(opts, D_IN)
    opt = opt_factory(net.parameters())
    g = torch.Generator().manual_seed(0)
    for _ in range(steps):
        x = torch.randn(8, D_IN, generator=g)
        y = torch.randint(0, D_OUT, (8,), generator=g)
        opt.zero_grad()
        loss = torch.nn.functional.nll_loss(net(x), y)
        loss.backward()
        opt.step()
    return net, opt


def _leaves_by_path(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_leaves_by_path(v, f"{prefix}/{k}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _find_states(state, field):
    """All namedtuple sub-states carrying `field` (e.g. 'nu')."""
    hits = []

    def rec(s):
        if hasattr(s, "_fields"):
            if field in s._fields:
                hits.append(getattr(s, field))
            for f in s._fields:
                rec(getattr(s, f))
        elif isinstance(s, (tuple, list)):
            for x in s:
                rec(x)

    rec(state)
    return hits


def test_rmsprop_square_avg_maps_like_weights():
    net, opt = _mlp_and_opt(
        lambda p: torch.optim.RMSprop(p, lr=1e-3, alpha=0.95, eps=1e-8))
    sd = net.state_dict()
    params, _ = import_model_par(sd, "MLP")
    state = import_optimizer_par(sd, opt.state_dict(), "MLP", params)
    assert state is not None
    (nu,) = _find_states(state, "nu")
    # the nu tree must mirror the param tree structurally…
    assert set(_leaves_by_path(nu)) == set(_leaves_by_path(params))
    # …and hold torch's square_avg, transposed exactly like the weights:
    # rebuild the expected tree by running the square_avgs through the
    # same model_par mapping.  NB the reference registers UNUSED ln/bn
    # modules too (neural_networks.py MLP builds every ModuleList entry
    # regardless of the use flags), so the optimizer group tracks more
    # params than ever receive gradients — those carry no torch state and
    # must import as zeros.
    tstate = opt.state_dict()["state"]
    names = [k for k in sd if "running" not in k and "num_batches" not in k]
    moment_sd = {
        n: tstate[i]["square_avg"]
        if i in tstate else torch.zeros_like(sd[n])
        for i, n in enumerate(names)
    }
    # buffers ride along so the bn mapping stays parseable (they land in
    # the discarded batch_stats half, not in the moments tree)
    moment_sd.update({k: v for k, v in sd.items() if k not in moment_sd})
    want, _ = import_model_par(moment_sd, "MLP")
    got, want = _leaves_by_path(nu), _leaves_by_path(want)
    for path in want:
        np.testing.assert_array_equal(got[path], want[path], err_msg=path)
    # the moments of the LIVE layers are strictly positive after real
    # steps — guards against silently grafting the zero init
    for live in ("/wx0/kernel", "/wx1/kernel", "/bn0/scale"):
        assert want[live].min() > 0, live


def test_sgd_momentum_buffer_maps():
    net, opt = _mlp_and_opt(
        lambda p: torch.optim.SGD(p, lr=0.01, momentum=0.9))
    sd = net.state_dict()
    params, _ = import_model_par(sd, "MLP")
    state = import_optimizer_par(sd, opt.state_dict(), "MLP", params)
    assert state is not None
    (trace,) = _find_states(state, "trace")
    assert set(_leaves_by_path(trace)) == set(_leaves_by_path(params))


def test_plain_sgd_has_nothing_to_import():
    net, opt = _mlp_and_opt(lambda p: torch.optim.SGD(p, lr=0.01))
    sd = net.state_dict()
    params, _ = import_model_par(sd, "MLP")
    assert import_optimizer_par(sd, opt.state_dict(), "MLP", params) is None


def test_adam_moments_and_step_map():
    net, opt = _mlp_and_opt(
        lambda p: torch.optim.Adam(p, lr=1e-3), steps=4)
    sd = net.state_dict()
    params, _ = import_model_par(sd, "MLP")
    state = import_optimizer_par(sd, opt.state_dict(), "MLP", params)
    assert state is not None
    (mu,) = _find_states(state, "mu")
    assert set(_leaves_by_path(mu)) == set(_leaves_by_path(params))
    # adam bias correction depends on the step count: it must carry over
    counts = _find_states(state, "count")
    assert any(int(np.asarray(c)) == 4 for c in counts)


def test_recurrent_gate_fusion_applies_to_moments():
    """liGRU per-gate square_avgs concatenate exactly like the fused
    weights (FF gates h then z)."""
    opts = {
        "ligru_lay": "6",
        "ligru_drop": "0.0",
        "ligru_use_laynorm_inp": "False",
        "ligru_use_batchnorm_inp": "False",
        "ligru_use_laynorm": "False",
        "ligru_use_batchnorm": "False",
        "ligru_bidir": "False",
        "ligru_act": "relu",
        "ligru_orthinit": "False",
        "use_cuda": "False",
        "to_do": "train",
    }
    net = ref_nn.liGRU(opts, D_IN)
    opt = torch.optim.RMSprop(net.parameters(), lr=1e-3, alpha=0.95)
    g = torch.Generator().manual_seed(1)
    for _ in range(2):
        x = torch.randn(9, 4, D_IN, generator=g)
        opt.zero_grad()
        net(x).sum().backward()
        opt.step()
    sd = net.state_dict()
    params, _ = import_model_par(sd, "liGRU")
    state = import_optimizer_par(sd, opt.state_dict(), "liGRU", params)
    assert state is not None
    (nu,) = _find_states(state, "nu")
    got, p = _leaves_by_path(nu), _leaves_by_path(params)
    assert set(got) == set(p)
    for path in p:
        assert got[path].shape == p[path].shape, path


def test_checkpoint_roundtrip_and_optimizer_mismatch(tmp_path):
    """convert_checkpoint_file writes the moments; load_all restores them
    against a matching optax template, and degrades to the template (with
    a warning, not a crash) when the cfg optimizer differs."""
    from types import SimpleNamespace

    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpukaldi.compat.torch_import import convert_checkpoint_file
    from tpukaldi.train.checkpoint import load_checkpoint
    from tpukaldi.train.optimizers import make_optimizer

    net, opt = _mlp_and_opt(
        lambda p: torch.optim.RMSprop(p, lr=1e-3, alpha=0.95, eps=1e-8))
    pkl = str(tmp_path / "final_architecture1.pkl")
    torch.save(
        {"model_par": net.state_dict(), "optimizer_par": opt.state_dict()},
        pkl,
    )
    ckpt = str(tmp_path / "final_MLP.ckpt")
    params, _ = convert_checkpoint_file(pkl, ckpt, "MLP")

    def arch(kind, **kw):
        return SimpleNamespace(
            name="a", lr=[0.01], options={},
            optimizer=SimpleNamespace(kind=kind, options=kw),
        )

    # matching optimizer: nu restored (nonzero)
    tmpl = make_optimizer(
        arch("rmsprop", opt_alpha=0.95, opt_eps=1e-8)).init(params)
    _, restored, _ = load_checkpoint(ckpt, params, tmpl, {})
    (nu,) = _find_states(restored, "nu")
    nu_leaves = _leaves_by_path(nu)
    # live layers carry real square averages; the reference's unused
    # (but registered) ln/bn params legitimately restore as zeros
    for live in ("/wx0/kernel", "/wx1/kernel", "/bn0/scale"):
        assert nu_leaves[live].min() > 0, f"square_avg not restored: {live}"

    # mismatched optimizer (cfg says sgd+momentum): keep template, no crash
    tmpl_sgd = make_optimizer(arch("sgd", opt_momentum=0.9)).init(params)
    _, kept, _ = load_checkpoint(ckpt, params, tmpl_sgd, {})
    (trace,) = _find_states(kept, "trace")
    assert all(
        np.all(np.asarray(v) == 0) for v in _leaves_by_path(trace).values()
    ), "mismatched optimizer state should fall back to the fresh template"
