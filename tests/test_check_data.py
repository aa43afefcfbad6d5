"""Preflight data validator (`run_exp --check-data`, VERDICT r3 #8):
a synthesized Kaldi tree validates clean, and each seeded defect —
missing ark, corrupt scp offset, missing final.mdl, wrong-length counts,
incomplete graph dir — surfaces as an actionable error without training."""

import os
import shutil

import numpy as np

from tpukaldi.compat import ref_harness as rh
from tpukaldi.config import load_config
from tpukaldi.tools.check_data import check_experiment_data, run_check


def _setup(tmp_path, name="t"):
    tree = rh.build_parity_tree(str(tmp_path / name / "tree"), seed=11)
    out = str(tmp_path / name / "exp")
    cfg = rh.write_parity_cfg(
        tree, out, str(tmp_path / name / "exp.cfg"), "tpukaldi", arch="MLP")
    return tree, cfg


def _errors(cfg):
    exp = load_config(cfg, [])
    return [i for i in check_experiment_data(exp) if i.severity == "error"]


def test_clean_tree_validates(tmp_path):
    tree, cfg = _setup(tmp_path)
    issues = _errors(cfg)
    assert issues == [], [str(i) for i in issues]
    assert run_check(cfg) == 0


def test_missing_ark_detected(tmp_path):
    tree, cfg = _setup(tmp_path)
    # remove the feature ark behind the train scp
    scp = tree.scp("train")
    ark = open(scp).readline().split()[1].rpartition(":")[0]
    os.remove(ark)
    msgs = [i.message for i in _errors(cfg)]
    assert any("does not exist" in m and ark in m for m in msgs), msgs
    assert run_check(cfg) == 1


def test_corrupt_scp_offset_detected(tmp_path):
    tree, cfg = _setup(tmp_path)
    scp = tree.scp("train")
    lines = open(scp).read().splitlines()
    utt, rx = lines[0].split(None, 1)
    path = rx.rpartition(":")[0]
    lines[0] = f"{utt} {path}:999999999"
    open(scp, "w").write("\n".join(lines) + "\n")
    msgs = [i.message for i in _errors(cfg)]
    assert any("fails to decode" in m for m in msgs), msgs


def test_missing_final_mdl_detected(tmp_path):
    tree, cfg = _setup(tmp_path)
    # force the raw-alignment resolution path: drop the pre-dumped label
    # arks, keep ali*.gz, remove final.mdl
    alidir = tree.alidir("train")
    for fn in os.listdir(alidir):
        if fn.endswith(".ark"):
            os.remove(os.path.join(alidir, fn))
    mdl = os.path.join(alidir, "final.mdl")
    if os.path.exists(mdl):
        os.remove(mdl)
    assert os.path.exists(os.path.join(alidir, "ali.1.gz")) or any(
        f.startswith("ali") and f.endswith(".gz") for f in os.listdir(alidir))
    msgs = [i.message for i in _errors(cfg)]
    assert any("final.mdl" in m for m in msgs), msgs


def test_wrong_counts_length_detected(tmp_path):
    tree, cfg = _setup(tmp_path)
    # rewrite the counts file with the wrong class count
    with open(tree.counts_file, "w") as f:
        f.write("[ " + " ".join(["1.0"] * 3) + " ]\n")
    msgs = [i.message for i in _errors(cfg)]
    assert any("classes but the network output" in m for m in msgs), msgs


def test_empty_scp_detected(tmp_path):
    tree, cfg = _setup(tmp_path)
    open(tree.scp("train"), "w").close()
    msgs = [i.message for i in _errors(cfg)]
    assert any("is empty" in m for m in msgs), msgs
