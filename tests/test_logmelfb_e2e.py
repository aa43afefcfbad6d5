"""logMelFb rate-differing experiment through the full driver: raw samples
in arks, 10ms-frame labels, 6-tuple max_seq_length (the reference's refac01
path, data_io.py:284-309)."""

import os
import re

import numpy as np
import pytest

from tpukaldi.io import ArkScpWriter, save_counts, write_vec_int, read_mat_ark
from tpukaldi.tools.run_exp import run_experiment

FS, SHIFT, WIN = 16000, 160, 400
N_CLASSES = 3


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("lmf")
    rng = np.random.default_rng(9)
    counts = np.zeros(N_CLASSES)
    dirs = {}
    for split, n in (("train", 8), ("dev", 3), ("test", 3)):
        d = root / split
        d.mkdir()
        with ArkScpWriter(str(d / "feats.ark"), str(d / "feats.scp")) as w, \
                open(d / "labels.ark", "wb") as labf:
            for i in range(n):
                n_lab = int(rng.integers(40, 90))
                n_samp = (n_lab - 1) * SHIFT + WIN
                labels = rng.integers(0, N_CLASSES, n_lab)
                t = np.arange(n_samp) / FS
                freq = 250.0 + 900.0 * labels[
                    np.minimum(np.arange(n_samp) // SHIFT, n_lab - 1)]
                sig = np.sin(2 * np.pi * freq * t)[:, None]
                key = f"{split}_u{i:02d}"
                w.write(key, sig.astype(np.float32))
                write_vec_int(labf, labels, key=key)
                if split == "train":
                    counts += np.bincount(labels, minlength=N_CLASSES)
        dirs[split] = str(d)
    counts_file = str(root / "counts")
    save_counts(np.maximum(counts, 1.0), counts_file)
    return root, dirs, counts_file


CFG = """
[cfg_proto]
cfg_proto = proto/global.proto
cfg_proto_chunk = proto/global_chunk.proto

[exp]
cmd =
run_nn_script = run_nn
out_folder = {out}
seed = 42
use_cuda = False
multi_gpu = False
save_gpumem = False
n_epochs_tr = 2

[dataset1]
data_name = tr
fea = fea_name=wave
\tfea_lst={train}/feats.scp
\tfea_opts=copy-feats ark:- ark:- |
\tcw_left=0
\tcw_right=0

lab = lab_name=lab_cd
\tlab_folder={train}
\tlab_opts=ali-to-pdf
\tlab_nout=3
\tlab_count_file={counts}
\tlab_data_folder={train}
\tlab_graph=none

n_chunks = 1

[dataset2]
data_name = dev
fea = fea_name=wave
\tfea_lst={dev}/feats.scp
\tfea_opts=copy-feats ark:- ark:- |
\tcw_left=0
\tcw_right=0

lab = lab_name=lab_cd
\tlab_folder={dev}
\tlab_opts=ali-to-pdf
\tlab_nout=3
\tlab_count_file={counts}
\tlab_data_folder={dev}
\tlab_graph=none

n_chunks = 1

[dataset3]
data_name = te
fea = fea_name=wave
\tfea_lst={test}/feats.scp
\tfea_opts=copy-feats ark:- ark:- |
\tcw_left=0
\tcw_right=0

lab = lab_name=lab_cd
\tlab_folder={test}
\tlab_opts=ali-to-pdf
\tlab_nout=3
\tlab_count_file={counts}
\tlab_data_folder={test}
\tlab_graph=none

n_chunks = 1

[data_use]
train_with = tr
valid_with = dev
forward_with = te

[batches]
batch_size_train = 2
max_seq_length_train = 32000,32000,199,199,160,400
increase_seq_length_train = False
start_seq_len_train = 100
multply_factor_seq_len_train = 2
batch_size_valid = 2
max_seq_length_valid = 1000

[architecture1]
arch_name = logmel_front
arch_proto = proto/logMelFb.proto
arch_library = tpukaldi.models
arch_class = logMelFb
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = True
logmelfb_nr_filt = 20
logmelfb_stft_window_size = 400
logmelfb_stft_window_shift = 160
arch_lr = 0.1
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture2]
arch_name = MLP_head
arch_proto = proto/MLP.proto
arch_library = tpukaldi.models
arch_class = MLP
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = False
dnn_lay = 32,N_out_lab_cd
dnn_drop = 0.0,0.0
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = False,False
dnn_use_laynorm = False,False
dnn_act = relu,softmax
arch_lr = 0.1
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[model]
model_proto = proto/model.proto
model = mel=compute(logmel_front,wave)
\tout_dnn=compute(MLP_head,mel)
\tloss_final=cost_nll(out_dnn,lab_cd)
\terr_final=cost_err(out_dnn,lab_cd)

[forward]
forward_out = out_dnn
normalize_posteriors = True
normalize_with_counts_from = {counts}
save_out_file = True
require_decoding = True
"""


def test_logmelfb_rate_experiment(corpus, tmp_path_factory):
    root, dirs, counts_file = corpus
    out = str(tmp_path_factory.mktemp("lmf_exp"))
    cfg_path = os.path.join(out, "exp.cfg")
    os.makedirs(out, exist_ok=True)
    with open(cfg_path, "w") as f:
        f.write(CFG.format(out=out, train=dirs["train"], dev=dirs["dev"],
                           test=dirs["test"], counts=counts_file))
    run_experiment(cfg_path)
    lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
    errs = [float(re.search(r"valid=\S+ loss=\S+ err=(\d+\.\d+)", l).group(1))
            for l in lines]
    assert errs[-1] < 0.6  # 3-class tones: learnable from log-mels
    ef = os.path.join(out, "exp_files")
    arks = [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")]
    posts = dict(read_mat_ark(os.path.join(ef, arks[0])))
    # posterior rows are LABEL frames: (n_samp - win)//shift + 1
    for key, mat in posts.items():
        assert mat.shape[1] == 3
        assert np.isfinite(mat).all()
