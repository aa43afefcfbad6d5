"""Reference-checkpoint migration: torch .pkl (core.py:712-722 format) ->
tpukaldi params, verified by output parity against the torch original."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
torch = pytest.importorskip("torch")
ref_nn = pytest.importorskip("neural_networks")

import jax
import jax.numpy as jnp

from tpukaldi.compat import convert_checkpoint_file, import_model_par
from tpukaldi.models import MLP, liGRU
from tpukaldi.train.checkpoint import load_checkpoint


def _mlp_opts():
    return {
        "dnn_lay": "16,10", "dnn_drop": "0.0,0.0",
        "dnn_use_batchnorm": "True,False", "dnn_use_laynorm": "False,False",
        "dnn_use_laynorm_inp": "False", "dnn_use_batchnorm_inp": "False",
        "dnn_act": "relu,softmax", "use_cuda": "False", "to_do": "forward",
    }


def _ligru_opts():
    return {
        "ligru_lay": "8,8", "ligru_drop": "0.0,0.0",
        "ligru_use_laynorm_inp": "False", "ligru_use_batchnorm_inp": "False",
        "ligru_use_laynorm": "False,False", "ligru_use_batchnorm": "True,True",
        "ligru_bidir": "True", "ligru_act": "relu,relu",
        "ligru_orthinit": "True", "use_cuda": "False", "to_do": "forward",
    }


def test_pkl_file_roundtrip_mlp(tmp_path):
    """torch.save'd reference checkpoint -> convert_checkpoint_file ->
    load_checkpoint -> bit-equal forward vs the torch original."""
    torch.manual_seed(3)
    ref = ref_nn.MLP(_mlp_opts(), 65)
    ref.train()
    for _ in range(2):
        ref(torch.randn(32, 65))  # accumulate BN running stats
    ref.eval()
    pkl = str(tmp_path / "train_ep23_ck4_MLP.pkl")
    torch.save({"model_par": ref.state_dict()}, pkl)

    ckpt = str(tmp_path / "pretrained_MLP.ckpt")
    convert_checkpoint_file(pkl, ckpt, "MLP")
    params, _, stats = load_checkpoint(ckpt)

    x = np.random.default_rng(7).standard_normal((16, 65)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(MLP(options=_mlp_opts(), inp_dim=65).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_state_dict_import_ligru_bidir_batchnorm():
    """The fused-BN mapping: per-gate BatchNorm1d vectors concatenate in
    FF_GATES order; 2-layer bidirectional liGRU matches torch."""
    torch.manual_seed(0)
    ref = ref_nn.liGRU(_ligru_opts(), 10)
    ref.train()
    with torch.no_grad():
        for _ in range(3):
            ref(torch.randn(12, 4, 10))
    ref.eval()
    params, stats = import_model_par(ref.state_dict(), "liGRU")
    x = np.random.default_rng(1).standard_normal((12, 4, 10)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(liGRU(options=_ligru_opts(), inp_dim=10).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_unsupported_class_raises():
    with pytest.raises(NotImplementedError, match="PASE"):
        import_model_par({}, "PASE")


def test_state_dict_import_sincnet():
    opts = {
        "sinc_N_filt": "8,6", "sinc_n_filt": "8,6", "sinc_len_filt": "65,5",
        "sinc_max_pool_len": "2,2", "sinc_act": "relu,relu",
        "sinc_drop": "0.0,0.0", "sinc_use_laynorm": "False,False",
        "sinc_use_batchnorm": "False,False", "sinc_use_laynorm_inp": "False",
        "sinc_use_batchnorm_inp": "False", "sinc_sample_rate": "16000",
        "sinc_min_low_hz": "50", "sinc_min_band_hz": "50",
        "sinc_fast": "False", "use_cuda": "False", "to_do": "forward",
    }
    from tpukaldi.models import SincNet

    torch.manual_seed(2)
    ref = ref_nn.SincNet(opts, 200).eval()
    params, stats = import_model_par(ref.state_dict(), "SincNet")
    x = np.random.default_rng(4).standard_normal((5, 200)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(SincNet(options=opts, inp_dim=200).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_state_dict_import_sincnet_with_input_laynorm():
    """The shipped SincNet_raw recipe trains with sinc_use_laynorm_inp=True
    (reference ln0, neural_networks.py:1491); the import must carry the
    trained ln0 gamma/beta into ln_inp or every forward is silently wrong."""
    opts = {
        "sinc_N_filt": "8,6", "sinc_n_filt": "8,6", "sinc_len_filt": "65,5",
        "sinc_max_pool_len": "2,2", "sinc_act": "relu,relu",
        "sinc_drop": "0.0,0.0", "sinc_use_laynorm": "False,False",
        "sinc_use_batchnorm": "False,False", "sinc_use_laynorm_inp": "True",
        "sinc_use_batchnorm_inp": "False", "sinc_sample_rate": "16000",
        "sinc_min_low_hz": "50", "sinc_min_band_hz": "50",
        "sinc_fast": "False", "use_cuda": "False", "to_do": "forward",
    }
    from tpukaldi.models import SincNet

    torch.manual_seed(3)
    ref = ref_nn.SincNet(opts, 200).eval()
    sd = ref.state_dict()
    # make the input-norm affine params distinguishable from fresh init
    sd["ln0.gamma"] = sd["ln0.gamma"] * 1.7 + 0.3
    sd["ln0.beta"] = sd["ln0.beta"] + 0.5
    ref.load_state_dict(sd)
    params, stats = import_model_par(sd, "SincNet")
    assert "ln_inp" in params, sorted(params)
    x = np.random.default_rng(6).standard_normal((5, 200)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(SincNet(options=opts, inp_dim=200).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_params_only_ckpt_loads_against_template(tmp_path):
    """A converted ckpt has no optimizer state; restoring against a live
    template must keep the template's opt state untouched."""
    from tpukaldi.train.checkpoint import save_checkpoint

    p = str(tmp_path / "p.ckpt")
    save_checkpoint(p, {"w": np.ones(3, np.float32)})
    params, opt, stats = load_checkpoint(
        p, {"w": np.zeros(3, np.float32)}, {"momentum": np.full(3, 7.0)}, {})
    np.testing.assert_array_equal(np.asarray(params["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(opt["momentum"]), 7.0)


def test_state_dict_import_qlstm():
    import quaternion_neural_networks as ref_qnn

    from tpukaldi.models import QLSTM

    opts = {"lstm_lay": "12", "lstm_drop": "0.0", "lstm_bidir": "True",
            "lstm_act": "tanh", "quaternion_init": "quaternion",
            "autograd": "True", "use_cuda": "False", "to_do": "forward"}
    torch.manual_seed(5)
    ref = ref_qnn.QLSTM(opts, 8).eval()
    params, stats = import_model_par(ref.state_dict(), "QLSTM")
    x = np.random.default_rng(2).standard_normal((9, 2, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(QLSTM(options=opts, inp_dim=8).apply(
        {"params": params}, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_migration_e2e_torch_trained_model_evaluates(tmp_path_factory):
    """Capstone migration proof: train the REFERENCE torch MLP on synthetic
    data, convert its checkpoint, then run it through the full tpukaldi
    driver with arch_opt=none (zero updates) — the imported weights alone
    must score far above chance on the dev split."""
    import re

    from tpukaldi.config import load_config
    from tpukaldi.data import load_chunk
    from tpukaldi.data.synth import generate_corpus, write_cfg
    from tpukaldi.tools.run_exp import run_experiment

    root = tmp_path_factory.mktemp("mig")
    corpus = generate_corpus(str(root / "c"), n_utts=10, seed=5, noise=0.4)
    out = str(root / "e")
    cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=1,
                    n_chunks=1, batch_size=32, cw=2, lr=0.1)
    exp = load_config(cfg)
    chunk = load_chunk(exp.datasets["synth_tr"], ["mfcc"], ["lab_cd"], 1000)
    D, n_out = chunk.feats.shape[1], int(chunk.labs.max()) + 1

    opts = {"dnn_lay": f"16,{n_out}", "dnn_drop": "0.0,0.0",
            "dnn_use_batchnorm": "True,False", "dnn_use_laynorm": "False,False",
            "dnn_use_laynorm_inp": "False", "dnn_use_batchnorm_inp": "False",
            "dnn_act": "relu,softmax", "use_cuda": "False", "to_do": "train"}
    torch.manual_seed(0)
    ref = ref_nn.MLP(opts, D)
    opt = torch.optim.SGD(ref.parameters(), lr=0.2)
    X = torch.from_numpy(chunk.feats)
    Y = torch.from_numpy(chunk.labs[:, 0].astype(np.int64))
    ref.train()
    for _ in range(30):
        opt.zero_grad()
        loss = torch.nn.functional.nll_loss(ref(X), Y)
        loss.backward()
        opt.step()

    pkl = str(root / "final_MLP.pkl")
    torch.save({"model_par": ref.state_dict()}, pkl)
    ck = str(root / "pretrained.ckpt")
    convert_checkpoint_file(pkl, ck, "MLP")

    text = "\n".join(
        l for l in open(cfg).read().splitlines()
        if not l.startswith(("opt_momentum", "opt_weight_decay",
                             "opt_dampening", "opt_nesterov")))
    text = text.replace("dnn_lay = 16,N_out_lab_cd", f"dnn_lay = 16,{n_out}")
    text = text.replace("arch_pretrain_file = none",
                        f"arch_pretrain_file = {ck}", 1)
    text = text.replace("arch_opt = sgd", "arch_opt = none", 1)
    open(cfg, "w").write(text)
    run_experiment(cfg)
    res = open(os.path.join(out, "res.res")).read().strip()
    verr = float(re.search(r"valid=\S+ loss=\S+ err=(\d+\.\d+)", res).group(1))
    assert verr < 0.3, res


def test_pase_native_forward_and_checkpoint_import(tmp_path):
    """Native PASE forward runs WITHOUT torch; a pase-style torch state
    dict (fabricated with the right shapes) converts onto it and changes
    the output (i.e. the imported weights are actually used)."""
    import json

    import jax
    import jax.numpy as jnp

    from tpukaldi.compat.torch_import import convert_pase_checkpoint
    from tpukaldi.models.pase import PASE

    cfgp = tmp_path / "pase.json"
    cfg = {"emb_dim": 12, "fmaps": [8, 16], "kwidths": [5, 5],
           "strides": [10, 16], "sinc_out": 8, "sinc_kwidth": 31}
    cfgp.write_text(json.dumps(cfg))
    opts = {"pase_cfg": str(cfgp)}
    m = PASE(options=opts, inp_dim=1)
    assert m.compute_out_dim(opts, 1) == 12

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((480, 2, 1)), jnp.float32)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    out0 = m.apply(v, x, train=False)
    assert out0.shape == (480 // 160, 2, 12)

    # fabricate a pase-shaped torch state dict (appearance order = arch
    # order; torch Conv1d weights are (out, in, k))
    def bn(prefix, c, sd):
        sd[f"{prefix}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)
        sd[f"{prefix}.num_batches_tracked"] = np.array(7)

    sd = {}
    sd["frontend.sinc.low_hz_"] = (
        rng.uniform(30, 4000, (8, 1)).astype(np.float32))
    sd["frontend.sinc.band_hz_"] = (
        rng.uniform(50, 400, (8, 1)).astype(np.float32))
    bn("frontend.bn0", 8, sd)
    sd["frontend.act0.weight"] = np.full(8, 0.1, np.float32)
    chans = [(8, 8, 5), (16, 8, 5)]
    for i, (o, inp, k) in enumerate(chans):
        sd[f"frontend.blocks.{i}.conv.weight"] = (
            rng.standard_normal((o, inp, k)).astype(np.float32) * 0.1)
        sd[f"frontend.blocks.{i}.conv.bias"] = np.zeros(o, np.float32)
        bn(f"frontend.blocks.{i}.bn", o, sd)
        sd[f"frontend.blocks.{i}.act.weight"] = np.array([0.2], np.float32)
    sd["frontend.emb.weight"] = (
        rng.standard_normal((12, 16, 1)).astype(np.float32) * 0.1)
    sd["frontend.emb.bias"] = np.zeros(12, np.float32)
    bn("frontend.emb_bn", 12, sd)

    params, stats = convert_pase_checkpoint(sd, opts)
    out1 = m.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert out1.shape == out0.shape
    assert np.isfinite(np.asarray(out1)).all()
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
    # per-channel prelu broadcast from torch's scalar form
    assert params["act0"].shape == (8,)
    np.testing.assert_allclose(params["act0"], 0.2)
