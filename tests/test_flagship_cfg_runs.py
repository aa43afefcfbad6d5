"""The flagship example cfg (cfg/TIMIT/liGRU_fmllr.cfg — joint cd+mono loss)
runs fully Kaldi-free against a synthesized tree carrying REAL alignment
formats: gzipped transition-id archives + a binary final.mdl.  This
exercises in one run: native ali-to-pdf AND ali-to-phones from the same
folder, native hmm-info for N_out_lab_cd/N_out_lab_mono substitution,
native analyze-counts (lab_count_file=auto), the fMLLR fea_opts pipeline,
curriculum seq-length, bidir Li-GRU training and posterior emission."""

import gzip
import io
import os
import re

import numpy as np
import pytest

from tests.test_transition_model import _make_tm
from tpukaldi.io import (
    ArkScpWriter,
    compute_cmvn_stats,
    write_mat,
    write_vec_int,
)
from tpukaldi.io.transition_model import write_transition_model
from tpukaldi.tools.run_exp import run_experiment

DIM = 10
N_PHONES = 3  # -> 9 pdfs with the 3-state Bakis fixture topology


@pytest.fixture(scope="module")
def kaldi_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("timit_fmllr")
    tm = _make_tm(n_phones=N_PHONES)
    rng = np.random.default_rng(21)
    # pdf-conditioned feature means make the task learnable
    means = rng.standard_normal((tm.num_pdfs, DIM)) * 2.0
    (root / "fmllr").mkdir()
    (root / "exp" / "tri3" / "graph").mkdir(parents=True)
    for split, n, ali in (
        ("train", 24, "dnn4_pretrain-dbn_dnn_ali"),
        ("dev", 4, "dnn4_pretrain-dbn_dnn_ali_dev"),
        ("test", 4, "dnn4_pretrain-dbn_dnn_ali_test"),
    ):
        d = root / "data" / split
        d.mkdir(parents=True)
        alidir = root / "exp" / ali
        alidir.mkdir(parents=True)
        write_transition_model(tm, str(alidir / "final.mdl"))
        cmvn = {}
        ali_buf = io.BytesIO()
        with ArkScpWriter(str(d / "feats.ark"), str(d / "feats.scp")) as w, \
                open(d / "utt2spk", "w") as u2s:
            for i in range(n):
                T = int(rng.integers(60, 140))
                # random walk over transition-ids (1..18)
                tids = rng.integers(1, tm.num_transition_ids + 1, T)
                pdfs = tm.transition_ids_to_pdfs(tids)
                fea = means[pdfs] + 0.5 * rng.standard_normal((T, DIM))
                key = f"{split}spk{i % 2}_u{i:02d}"
                spk = f"{split}spk{i % 2}"
                w.write(key, fea.astype(np.float32))
                u2s.write(f"{key} {spk}\n")
                write_vec_int(ali_buf, tids, key=key)
                cmvn[spk] = cmvn.get(spk, 0) + compute_cmvn_stats(fea)
        with gzip.open(alidir / "ali.1.gz", "wb") as f:
            f.write(ali_buf.getvalue())
        # cfgs list all three corpus streams; alias the same ark for each
        import shutil

        for stream in ("mfcc", "fbank", "fmllr"):
            shutil.copyfile(d / "feats.scp", d / f"feats_{stream}.scp")
            (root / stream).mkdir(exist_ok=True)
            with open(root / stream / f"cmvn_{split}.ark", "wb") as cf:
                for spk, st in cmvn.items():
                    write_mat(cf, st, key=spk)
    return root


def test_flagship_cfg_runs(kaldi_tree, tmp_path_factory):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    template = open(os.path.join(repo, "cfg", "TIMIT", "liGRU_fmllr.cfg")).read()
    out = str(tmp_path_factory.mktemp("flagship_run"))
    text = template.replace("$KALDI_TIMIT", str(kaldi_tree))
    text = text.replace("out_folder = exp/TIMIT_liGRU_fmllr",
                        f"out_folder = {out}")
    # shrink: 2 epochs, 2 chunks, 2x32 liGRU, batch 2
    text = text.replace("n_epochs_tr = 24", "n_epochs_tr = 5")
    text = text.replace("n_chunks = 5", "n_chunks = 2")
    text = text.replace("ligru_lay = 550,550,550,550,550",
                        "ligru_lay = 32,32")
    text = text.replace("ligru_drop = 0.2,0.2,0.2,0.2,0.2",
                        "ligru_drop = 0.1,0.1")
    text = text.replace("ligru_use_laynorm = False,False,False,False,False",
                        "ligru_use_laynorm = False,False")
    # BN running stats need hundreds of steps to converge; the shrunken
    # smoke recipe turns it off so eval-mode outputs track train-mode
    text = text.replace("ligru_use_batchnorm = True,True,True,True,True",
                        "ligru_use_batchnorm = False,False")
    text = text.replace("ligru_act = relu,relu,relu,relu,relu",
                        "ligru_act = relu,relu")
    text = text.replace("batch_size_train = 8", "batch_size_train = 2")
    text = text.replace("batch_size_valid = 8", "batch_size_valid = 2")
    text = text.replace("arch_lr = 0.0004", "arch_lr = 0.03")
    cfg_path = os.path.join(out, "run.cfg")
    os.makedirs(out, exist_ok=True)
    open(cfg_path, "w").write(text)

    run_experiment(cfg_path)

    lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
    assert len(lines) == 5
    # N_out auto-substitution happened via native hmm-info: cd=9, mono=3
    conf = open(os.path.join(out, "conf.cfg")).read()
    assert "dnn_lay = 9" in conf
    assert "dnn_lay = 3" in conf
    # native analyze-counts generated the prior file
    ef = os.path.join(out, "exp_files")
    count_files = [f for f in os.listdir(ef) if f.endswith(".count")]
    assert count_files
    # posteriors: 9 pdf classes, decode-ready
    from tpukaldi.io import read_mat_ark

    arks = [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")]
    posts = dict(read_mat_ark(os.path.join(ef, arks[0])))
    assert all(m.shape[1] == 9 and np.isfinite(m).all()
               for m in posts.values())
    # joint loss trained: validation error beats chance (1 - 1/9 = 0.889)
    errs = [float(re.search(r"valid=\S+ loss=\S+ err=(\d+\.\d+)", l).group(1))
            for l in lines]
    assert errs[-1] < 0.85, errs  # beats 8/9 chance
