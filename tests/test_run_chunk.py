"""Standalone chunk execution: a chunk cfg written by the planner can be
re-executed out-of-process (reference's run_nn(chunk_cfg) unit of cluster
scheduling, run_exp.py:256-258) and reproduces the in-process ledger
entry bit-for-bit."""

import glob
import os
import re

import pytest

from tpukaldi.data.synth import generate_corpus, write_cfg
from tpukaldi.tools.run_chunk import run_chunk
from tpukaldi.tools.run_exp import run_experiment


@pytest.fixture(scope="module")
def exp_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("rc")
    corpus = generate_corpus(str(root / "c"), n_utts=12, seed=9, noise=0.4)
    out = str(root / "e")
    cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=1,
                    n_chunks=2, batch_size=32, lr=0.2)
    run_experiment(cfg)
    return out


def _results(path):
    return {k: v for k, v in re.findall(r"(\w+)=(\S+)", open(path).read())}


def test_standalone_train_chunk_matches_ledger(exp_dir):
    ef = os.path.join(exp_dir, "exp_files")
    info = os.path.join(ef, "train_synth_tr_ep0_ck0.info")
    orig = _results(info)
    os.remove(info)
    for f in glob.glob(os.path.join(ef, "train_synth_tr_ep0_ck0_*.ckpt")):
        os.remove(f)
    run_chunk(os.path.join(ef, "train_synth_tr_ep0_ck0.cfg"))
    new = _results(info)
    assert new["loss"] == orig["loss"] and new["err"] == orig["err"]
    # checkpoint the driver's resume logic expects is re-materialized
    assert glob.glob(os.path.join(ef, "train_synth_tr_ep0_ck0_*.ckpt"))


def test_standalone_valid_and_forward_chunks(exp_dir):
    ef = os.path.join(exp_dir, "exp_files")
    vcfg = glob.glob(os.path.join(ef, "valid_*.cfg"))[0]
    orig = _results(vcfg.replace(".cfg", ".info"))
    info = run_chunk(vcfg)
    assert _results(info)["err"] == orig["err"]
    fcfg = glob.glob(os.path.join(ef, "forward_*.cfg"))[0]
    info = run_chunk(fcfg)
    assert os.path.exists(info)


def test_bf16_chunk_cfg_propagates_and_matches(tmp_path_factory):
    """A bf16 experiment's chunk cfgs carry [exp] compute_dtype, so the
    standalone re-execution computes in the same dtype and reproduces the
    ledger bit-for-bit."""
    root = tmp_path_factory.mktemp("rc16")
    corpus = generate_corpus(str(root / "c"), n_utts=12, seed=9, noise=0.4)
    out = str(root / "e")
    cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=1,
                    n_chunks=2, batch_size=32, lr=0.2)
    text = open(cfg).read().replace(
        "[exp]", "[exp]\ncompute_dtype = bfloat16", 1
    )
    open(cfg, "w").write(text)
    run_experiment(cfg)
    ef = os.path.join(out, "exp_files")
    chunk_cfg = os.path.join(ef, "train_synth_tr_ep0_ck0.cfg")
    assert "compute_dtype = bfloat16" in open(chunk_cfg).read()
    info = os.path.join(ef, "train_synth_tr_ep0_ck0.info")
    orig = _results(info)
    os.remove(info)
    for f in glob.glob(os.path.join(ef, "train_synth_tr_ep0_ck0_*.ckpt")):
        os.remove(f)
    run_chunk(chunk_cfg)
    new = _results(info)
    assert new["loss"] == orig["loss"] and new["err"] == orig["err"]


def test_rejects_global_cfg(exp_dir):
    global_cfg = glob.glob(os.path.join(exp_dir, "*.cfg"))[0]
    with pytest.raises(ValueError, match="not a chunk cfg"):
        run_chunk(global_cfg)
