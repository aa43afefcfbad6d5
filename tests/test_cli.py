"""CLI entry points: argument parsing, exit codes, and one true
`python -m` subprocess drive of the flagship driver (the interface the
reference documents as `python run_exp.py cfg [overrides]`,
README.md:139-200)."""

import os
import subprocess
import sys

import pytest

from tpukaldi.data.synth import generate_corpus, write_cfg


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    return generate_corpus(str(root), n_utts=8, seed=3, noise=0.4)


def test_run_exp_usage_and_config_error(tmp_path):
    from tpukaldi.tools.run_exp import main

    assert main([]) == 2  # usage
    bad = tmp_path / "bad.cfg"
    bad.write_text("[exp]\nout_folder = x\n")
    assert main([str(bad)]) == 1  # config error -> exit 1, no traceback


def test_run_exp_subprocess_with_override(corpus, tmp_path_factory):
    """True `python -m` drive: run the driver in a subprocess with a CLI
    override and check it took effect in the stored conf snapshot."""
    out = str(tmp_path_factory.mktemp("sub"))
    cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=1,
                    n_chunks=1, batch_size=32, lr=0.2)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    proc = subprocess.run(
        [sys.executable, "-m", "tpukaldi.tools.run_exp", cfg,
         "--batches,batch_size_train=16"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "res.res"))
    conf = open(os.path.join(out, "conf.cfg")).read()
    assert "batch_size_train = 16" in conf


def test_other_clis_usage_exit_codes():
    from tpukaldi.tools import (metrics, plot_acc_and_loss, run_chunk,
                                save_raw_fea, tune_hyperparameters)

    assert run_chunk.main([]) == 2
    assert metrics.main([]) == 2
    assert plot_acc_and_loss.main([]) == 2
    assert plot_acc_and_loss.main(["/nonexistent"]) == 1
    assert tune_hyperparameters.main([]) == 2
    with pytest.raises(SystemExit) as e:  # argparse-based CLI
        save_raw_fea.main([])
    assert e.value.code == 2
