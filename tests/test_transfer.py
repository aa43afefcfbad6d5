"""Transfer learning via arch_pretrain_file (reference README.md:504,
core.py:523-535): experiment B starts from experiment A's final checkpoint,
optionally frozen."""

import os
import re

import pytest

from tpukaldi.data.synth import generate_corpus, write_cfg
from tpukaldi.tools.run_exp import run_experiment


@pytest.fixture(scope="module")
def pretrained(tmp_path_factory):
    root = tmp_path_factory.mktemp("tr")
    corpus = generate_corpus(str(root / "c"), n_utts=10, seed=12, noise=0.4)
    out_a = str(root / "expA")
    cfg = write_cfg(corpus, out_a, arch="MLP", n_epochs=3, n_chunks=1,
                    batch_size=64, lr=0.3)
    run_experiment(cfg)
    final = os.path.join(out_a, "exp_files", "final_MLP_layers1.ckpt")
    assert os.path.exists(final)
    return corpus, final, root


def _first_valid_err(out):
    line = open(os.path.join(out, "res.res")).read().splitlines()[0]
    return float(re.search(r"valid=\S+ loss=\S+ err=(\d+\.\d+)", line).group(1))


def test_pretrain_file_warm_start(pretrained, tmp_path_factory):
    corpus, final, root = pretrained
    # cold baseline: 1 epoch from random init
    out_cold = str(tmp_path_factory.mktemp("cold"))
    cfg_cold = write_cfg(corpus, out_cold, arch="MLP", n_epochs=1,
                         n_chunks=1, batch_size=64, lr=0.01)
    run_experiment(cfg_cold)
    err_cold = _first_valid_err(out_cold)

    # warm start from experiment A's final checkpoint
    out_warm = str(tmp_path_factory.mktemp("warm"))
    cfg_warm = write_cfg(corpus, out_warm, arch="MLP", n_epochs=1,
                         n_chunks=1, batch_size=64, lr=0.01)
    text = open(cfg_warm).read().replace(
        "arch_pretrain_file = none", f"arch_pretrain_file = {final}"
    )
    open(cfg_warm, "w").write(text)
    run_experiment(cfg_warm)
    err_warm = _first_valid_err(out_warm)
    assert err_warm < err_cold * 0.5, (err_cold, err_warm)


def test_pretrain_frozen_arch(pretrained, tmp_path_factory):
    """Frozen pretrained arch: params untouched by training."""
    import numpy as np

    from tpukaldi.train.checkpoint import load_checkpoint

    corpus, final, root = pretrained
    out = str(tmp_path_factory.mktemp("frozen"))
    cfg = write_cfg(corpus, out, arch="MLP", n_epochs=1, n_chunks=1,
                    batch_size=64, lr=0.3)
    text = open(cfg).read()
    text = text.replace("arch_pretrain_file = none",
                        f"arch_pretrain_file = {final}")
    text = text.replace("arch_freeze = False", "arch_freeze = True")
    open(cfg, "w").write(text)
    run_experiment(cfg)
    p0, _, _ = load_checkpoint(final)
    trained = os.path.join(out, "exp_files", "final_MLP_layers1.ckpt")
    p1, _, _ = load_checkpoint(trained)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
