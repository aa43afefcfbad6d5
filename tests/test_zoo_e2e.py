"""End-to-end run_experiment smoke across the recurrent zoo.

Each family already has direct output-parity tests against the reference's
own torch modules (test_reference_model_parity.py); this file proves each
also trains through the full driver — cfg parse -> plan -> graph compile ->
jitted steps -> res.res -- and learns above chance on the synthetic corpus
(reference behavior: run_exp.py end-to-end loop)."""

import os
import re

import pytest

from tpukaldi.data.synth import generate_corpus, write_cfg
from tpukaldi.tools.run_exp import run_experiment

ZOO = ["GRU", "LSTM", "RNN", "minimalGRU", "SRU", "QLSTM"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    # feat_dim 12: QLSTM requires dims divisible by 4; harmless elsewhere
    root = tmp_path_factory.mktemp("zoo")
    return generate_corpus(str(root), n_utts=10, feat_dim=12, seed=31,
                           min_len=40, max_len=120, noise=0.3)


@pytest.mark.parametrize("arch", ZOO)
def test_zoo_arch_trains_e2e(corpus, arch, tmp_path_factory):
    out = str(tmp_path_factory.mktemp(f"e_{arch}"))
    cfg = write_cfg(corpus, out, arch=arch, hidden=16, n_epochs=1,
                    n_chunks=1, batch_size=4, cw=0, lr=0.05)
    run_experiment(cfg)
    res = open(os.path.join(out, "res.res")).read().strip()
    # post-epoch valid err (epoch-averaged train err is diluted by early
    # batches).  The 3-utterance dev split is < batch_size_valid, so this
    # also regression-tests the smaller-than-one-batch valid fallback:
    # without it valid would silently report 0.000.
    verr = float(re.search(r"valid=\S+ loss=\S+ err=(\d+\.\d+)", res).group(1))
    assert 0.0 < verr < 0.85, f"{arch} bogus valid err: {res}"


def test_arch_opt_none_freezes_params(corpus, tmp_path_factory):
    """refac01's arch_opt=none (reference proto/global_refac01.proto:47):
    the architecture gets no optimizer update at all, so training is a
    no-op and error stays at chance."""
    out = str(tmp_path_factory.mktemp("optnone"))
    cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=1,
                    n_chunks=1, batch_size=32, cw=2, lr=0.2)
    lines = [l for l in open(cfg).read().splitlines()
             if not l.startswith(("opt_momentum", "opt_weight_decay",
                                  "opt_dampening", "opt_nesterov"))]
    open(cfg, "w").write(
        "\n".join(lines).replace("arch_opt = sgd", "arch_opt = none", 1))
    run_experiment(cfg)
    res = open(os.path.join(out, "res.res")).read().strip()
    err = float(re.search(r"err=(\d+\.\d+)", res).group(1))
    loss = float(re.search(r"loss=(\d+\.\d+)", res).group(1))
    assert err > 0.8 and abs(loss - 2.303) < 0.05  # ln(10): untouched net


def test_scheduled_dropout_applied_at_runtime(corpus, tmp_path_factory):
    """Per-epoch dropout schedules (reference utils.py:872-906 bakes
    drop_rates into chunk cfgs) must change the *runtime* rate, not just
    the ledger: 0.85->0.0 at epoch 1 learns, constant 0.85 doesn't."""
    def run(drop_spec, tag):
        out = str(tmp_path_factory.mktemp(tag))
        cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=2,
                        n_chunks=1, batch_size=32, cw=2, lr=0.2)
        text = open(cfg).read().replace(
            "dnn_drop = 0.1,0.0", f"dnn_drop = {drop_spec},0.0")
        open(cfg, "w").write(text)
        run_experiment(cfg)
        lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
        return [float(re.search(r"err=(\d+\.\d+)", l).group(1)) for l in lines]

    scheduled = run("0.85*1|0.0*1", "dsched")
    constant = run("0.85", "dconst")
    assert scheduled[0] == constant[0]          # epoch 0 identical
    assert scheduled[1] < constant[1] - 0.2     # epoch 1 diverges hard
