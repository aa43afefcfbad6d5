"""Synthetic mini-corpus generator — the stand-in for the reference's
`quick_test` fixture dataset (README.md:380-390), used by tests, smoke runs,
and benchmarks.

Generates a learnable frame-classification task: each of `n_classes` HMM
states has a Gaussian mean in feature space; utterances are random state
sequences with dwell times; features are means + noise.  Emits a full
Kaldi-style data dir (feats ark+scp, pre-dumped label ark, count file,
utt2spk, cmvn stats) plus an INI cfg, so the whole framework runs end to end
without Kaldi or real speech.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict

import numpy as np

from ..io import ArkScpWriter, compute_cmvn_stats, save_counts, write_mat, write_vec_int


@dataclass
class SynthCorpus:
    root: str
    feats_scp: Dict[str, str]  # split -> scp path
    lab_folder: Dict[str, str]  # split -> label dir
    counts_file: str
    n_classes: int
    feat_dim: int


def generate_corpus(
    root: str,
    n_utts: int = 20,
    feat_dim: int = 13,
    n_classes: int = 10,
    min_len: int = 60,
    max_len: int = 220,
    noise: float = 0.6,
    seed: int = 1234,
    splits=("train", "dev", "test"),
) -> SynthCorpus:
    rng = np.random.default_rng(seed)
    means = rng.standard_normal((n_classes, feat_dim)) * 2.0
    feats_scp, lab_folder = {}, {}
    counts = np.zeros(n_classes)
    os.makedirs(root, exist_ok=True)
    for si, split in enumerate(splits):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        # n_utts: one int (dev/test get a third) or a per-split sequence —
        # large-scale soaks need a big train split WITHOUT a proportionally
        # huge forward split
        if isinstance(n_utts, (tuple, list)):
            n = n_utts[si]
        else:
            n = n_utts if split == "train" else max(n_utts // 3, 2)
        with ArkScpWriter(
            os.path.join(d, "feats.ark"), os.path.join(d, "feats.scp")
        ) as w, open(os.path.join(d, "labels.ark"), "wb") as labf, open(
            os.path.join(d, "utt2spk"), "w"
        ) as u2s:
            cmvn = {}
            for i in range(n):
                T = int(rng.integers(min_len, max_len))
                # random state sequence with dwell times 3-15 frames
                labels = []
                while len(labels) < T:
                    state = int(rng.integers(0, n_classes))
                    labels.extend([state] * int(rng.integers(3, 15)))
                labels = np.array(labels[:T])
                fea = means[labels] + noise * rng.standard_normal((T, feat_dim))
                key = f"{split}spk{i % 3}_utt{i:03d}"
                w.write(key, fea.astype(np.float32))
                write_vec_int(labf, labels, key=key)
                spk = f"{split}spk{i % 3}"
                u2s.write(f"{key} {spk}\n")
                cmvn[spk] = cmvn.get(spk, 0) + compute_cmvn_stats(fea)
                if split == "train":
                    counts += np.bincount(labels, minlength=n_classes)
            with open(os.path.join(d, "cmvn.ark"), "wb") as cf:
                for spk, st in cmvn.items():
                    write_mat(cf, st, key=spk)
        feats_scp[split] = os.path.join(d, "feats.scp")
        lab_folder[split] = d
    counts_file = os.path.join(root, "counts")
    save_counts(np.maximum(counts, 1.0), counts_file)
    return SynthCorpus(
        root=root,
        feats_scp=feats_scp,
        lab_folder=lab_folder,
        counts_file=counts_file,
        n_classes=n_classes,
        feat_dim=feat_dim,
    )


def load_corpus(root: str, splits=("train", "dev", "test")) -> SynthCorpus:
    """Reconstruct the SynthCorpus handle for an already-generated tree
    (e.g. the cached TIMIT-scale bench corpus) without regenerating data."""
    from ..io import load_counts, read_mat_ark

    counts_file = os.path.join(root, "counts")
    n_classes = int(load_counts(counts_file).shape[0])
    gen = read_mat_ark(os.path.join(root, splits[0], "feats.ark"))
    first = next(gen)
    gen.close()  # release the ark file handle (the generator owns it)
    return SynthCorpus(
        root=root,
        feats_scp={s: os.path.join(root, s, "feats.scp") for s in splits},
        lab_folder={s: os.path.join(root, s) for s in splits},
        counts_file=counts_file,
        n_classes=n_classes,
        feat_dim=int(first[1].shape[1]),
    )


MLP_CFG_TEMPLATE = """
[cfg_proto]
cfg_proto = proto/global.proto
cfg_proto_chunk = proto/global_chunk.proto

[exp]
cmd =
run_nn_script = run_nn
out_folder = {out_folder}
seed = {seed}
use_cuda = False
multi_gpu = False
save_gpumem = False
n_epochs_tr = {n_epochs}

[dataset1]
data_name = synth_tr
fea = fea_name=mfcc
\tfea_lst={train_scp}
\tfea_opts={fea_opts}
\tcw_left={cw}
\tcw_right={cw}

lab = lab_name=lab_cd
\tlab_folder={train_lab}
\tlab_opts=ali-to-pdf
\tlab_count_file={counts}
\tlab_data_folder={train_lab}
\tlab_graph=none

n_chunks = {n_chunks}

[dataset2]
data_name = synth_dev
fea = fea_name=mfcc
\tfea_lst={dev_scp}
\tfea_opts={fea_opts}
\tcw_left={cw}
\tcw_right={cw}

lab = lab_name=lab_cd
\tlab_folder={dev_lab}
\tlab_opts=ali-to-pdf
\tlab_count_file={counts}
\tlab_data_folder={dev_lab}
\tlab_graph=none

n_chunks = 1

[dataset3]
data_name = synth_te
fea = fea_name=mfcc
\tfea_lst={test_scp}
\tfea_opts={fea_opts}
\tcw_left={cw}
\tcw_right={cw}

lab = lab_name=lab_cd
\tlab_folder={test_lab}
\tlab_opts=ali-to-pdf
\tlab_count_file={counts}
\tlab_data_folder={test_lab}
\tlab_graph=none

n_chunks = 1

[data_use]
train_with = synth_tr
valid_with = synth_dev
forward_with = synth_te

[batches]
batch_size_train = {batch_size}
max_seq_length_train = 1000
increase_seq_length_train = False
start_seq_len_train = 100
multply_factor_seq_len_train = 2
batch_size_valid = {batch_size}
max_seq_length_valid = 1000

[architecture1]
arch_name = {arch_name}
arch_proto = proto/{arch_proto}
arch_library = tpukaldi.models
arch_class = {arch_class}
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = {seq_model}
{arch_options}
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False
{extra_sections}
[model]
model_proto = proto/model.proto
model = {model_lines}

[forward]
forward_out = {forward_out}
normalize_posteriors = True
normalize_with_counts_from = {counts}
save_out_file = False
require_decoding = True
"""

# softmax classifier head used after sequential front-ends, mirroring the
# reference's liGRU cfgs (liGRU -> MLP(softmax) -> cost_nll)
MLP_HEAD_SECTION = """
[architecture2]
arch_name = MLP_softmax
arch_proto = proto/MLP.proto
arch_library = tpukaldi.models
arch_class = MLP
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = False
dnn_lay = N_out_lab_cd
dnn_drop = 0.0
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = False
dnn_use_laynorm = False
dnn_act = softmax
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False
"""

MLP_OPTIONS = """dnn_lay = {hidden},N_out_lab_cd
dnn_drop = 0.1,0.0
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = True,False
dnn_use_laynorm = False,False
dnn_act = relu,softmax"""

LIGRU_OPTIONS = """ligru_lay = {hidden}
ligru_drop = 0.1
ligru_use_laynorm_inp = False
ligru_use_batchnorm_inp = False
ligru_use_laynorm = False
ligru_use_batchnorm = True
ligru_bidir = True
ligru_act = relu
ligru_orthinit = True"""


def write_cfg(
    corpus: SynthCorpus,
    out_folder: str,
    arch: str = "MLP",
    hidden: int = 64,
    n_epochs: int = 2,
    n_chunks: int = 2,
    batch_size: int = 32,
    cw: int = 2,
    lr: float = 0.08,
    seed: int = 1234,
    fea_opts: str = "copy-feats ark:- ark:- |",
) -> str:
    """Emit an INI cfg for the synthetic corpus; returns cfg path."""
    if arch == "MLP":
        arch_options = MLP_OPTIONS.format(hidden=hidden)
        arch_class, arch_proto, seq_model, arch_name = (
            "MLP", "MLP.proto", "False", "MLP_layers1")
        extra_sections = ""
        model_lines = (
            f"out_dnn1=compute({arch_name},mfcc)\n"
            "\tloss_final=cost_nll(out_dnn1,lab_cd)\n"
            "\terr_final=cost_err(out_dnn1,lab_cd)"
        )
        forward_out = "out_dnn1"
    elif arch == "QLSTM":
        arch_options = (
            f"lstm_lay = {hidden}\nlstm_drop = 0.1\nlstm_bidir = True\n"
            "lstm_act = tanh\nquaternion_init = quaternion\nautograd = True"
        )
        arch_class, arch_proto, seq_model, arch_name = (
            "QLSTM", "QLSTM.proto", "True", "QLSTM_layers")
        extra_sections = MLP_HEAD_SECTION.format(lr=lr)
        model_lines = (
            f"out_dnn1=compute({arch_name},mfcc)\n"
            "\tout_dnn2=compute(MLP_softmax,out_dnn1)\n"
            "\tloss_final=cost_nll(out_dnn2,lab_cd)\n"
            "\terr_final=cost_err(out_dnn2,lab_cd)"
        )
        forward_out = "out_dnn2"
    elif arch == "SRU":
        arch_options = (
            f"sru_hidden_size = {hidden}\nsru_num_layers = 2\n"
            "sru_dropout = 0.1\nsru_rnn_dropout = 0.0\nsru_use_tanh = True\n"
            "sru_use_relu = False\nsru_use_selu = False\n"
            "sru_weight_norm = False\nsru_layer_norm = False\n"
            "sru_bidirectional = True\nsru_is_input_normalized = False\n"
            "sru_has_skip_term = True\nsru_rescale = True\n"
            "sru_highway_bias = -1.0\nsru_n_proj = 0"
        )
        arch_class, arch_proto, seq_model, arch_name = (
            "SRU", "SRU.proto", "True", "SRU_layers")
        extra_sections = MLP_HEAD_SECTION.format(lr=lr)
        model_lines = (
            f"out_dnn1=compute({arch_name},mfcc)\n"
            "\tout_dnn2=compute(MLP_softmax,out_dnn1)\n"
            "\tloss_final=cost_nll(out_dnn2,lab_cd)\n"
            "\terr_final=cost_err(out_dnn2,lab_cd)"
        )
        forward_out = "out_dnn2"
    elif arch == "SincNet":
        # raw-window front-end (windows of `inp` samples) + MLP softmax head
        arch_options = (
            "sinc_n_filt = 16\nsinc_len_filt = 65\nsinc_max_pool_len = 16\n"
            "sinc_sample_rate = 16000\nsinc_min_low_hz = 50\n"
            "sinc_min_band_hz = 50\nsinc_use_laynorm_inp = False\n"
            "sinc_use_batchnorm_inp = False\nsinc_use_laynorm = True\n"
            "sinc_use_batchnorm = False\nsinc_act = leaky_relu\n"
            "sinc_drop = 0.0"
        )
        arch_class, arch_proto, seq_model, arch_name = (
            "SincNet", "SincNet.proto", "False", "SincNet_layers")
        extra_sections = MLP_HEAD_SECTION.format(lr=lr)
        model_lines = (
            f"out_cnn=compute({arch_name},mfcc)\n"
            "\tout_dnn2=compute(MLP_softmax,out_cnn)\n"
            "\tloss_final=cost_nll(out_dnn2,lab_cd)\n"
            "\terr_final=cost_err(out_dnn2,lab_cd)"
        )
        forward_out = "out_dnn2"
    elif arch == "fusionRNN":
        # multi-microphone: input = n_mic x per-mic features concatenated
        arch_options = (
            f"fusionRNN_lay = {hidden},{hidden}\n"
            "fusionRNN_drop = 0.2,0.2\nfusionRNN_bidir = True\n"
            "fusionRNN_act = prelu,prelu\nfusionRNN_do_fusion = True\n"
            f"fusionRNN_fusion_layer_size = {hidden * 6}\n"
            "fusionRNN_number_of_mic = 6\nfusionRNN_fusion_act = prelu\n"
            "fusionRNN_fusion_reduce = sum"
        )
        arch_class, arch_proto, seq_model, arch_name = (
            "fusionRNN_jit", "fusionRNN.proto", "True", "fusionRNN_layers")
        extra_sections = MLP_HEAD_SECTION.format(lr=lr)
        model_lines = (
            f"out_dnn1=compute({arch_name},mfcc)\n"
            "\tout_dnn2=compute(MLP_softmax,out_dnn1)\n"
            "\tloss_final=cost_nll(out_dnn2,lab_cd)\n"
            "\terr_final=cost_err(out_dnn2,lab_cd)"
        )
        forward_out = "out_dnn2"
    elif arch in ("liGRU", "GRU", "LSTM", "RNN", "minimalGRU"):
        prefix = arch.lower()
        arch_options = LIGRU_OPTIONS.format(hidden=hidden).replace(
            "ligru_", f"{prefix}_"
        )
        if arch != "liGRU":  # relu candidates explode in LSTM/GRU cells
            arch_options = arch_options.replace(
                f"{prefix}_act = relu", f"{prefix}_act = tanh"
            )
        arch_class, arch_proto, seq_model, arch_name = (
            arch, f"{arch}.proto", "True", f"{arch}_layers")
        extra_sections = MLP_HEAD_SECTION.format(lr=lr)
        model_lines = (
            f"out_dnn1=compute({arch_name},mfcc)\n"
            "\tout_dnn2=compute(MLP_softmax,out_dnn1)\n"
            "\tloss_final=cost_nll(out_dnn2,lab_cd)\n"
            "\terr_final=cost_err(out_dnn2,lab_cd)"
        )
        forward_out = "out_dnn2"
    else:
        raise ValueError(f"unknown synth arch {arch!r}")
    cfg = MLP_CFG_TEMPLATE.format(
        out_folder=out_folder,
        seed=seed,
        n_epochs=n_epochs,
        train_scp=corpus.feats_scp["train"],
        dev_scp=corpus.feats_scp["dev"],
        test_scp=corpus.feats_scp["test"],
        train_lab=corpus.lab_folder["train"],
        dev_lab=corpus.lab_folder["dev"],
        test_lab=corpus.lab_folder["test"],
        counts=corpus.counts_file,
        n_chunks=n_chunks,
        batch_size=batch_size,
        cw=cw,
        lr=lr,
        arch_name=arch_name,
        arch_proto=arch_proto,
        arch_class=arch_class,
        seq_model=seq_model,
        arch_options=arch_options,
        fea_opts=fea_opts,
        extra_sections=extra_sections,
        model_lines=model_lines,
        forward_out=forward_out,
    )
    path = os.path.join(corpus.root, f"exp_{arch}.cfg")
    with open(path, "w") as f:
        f.write(cfg)
    return path
