"""Generate the shipped example cfgs (cfg/) — tpukaldi equivalents of the
reference baseline set (cfg/TIMIT_baselines, Librispeech_baselines,
DIRHA_baselines).  Data paths use $KALDI_TIMIT / $KALDI_LIBRI / $KALDI_DIRHA
placeholders the user substitutes for their Kaldi egs tree.

  python -m tpukaldi.tools.gen_example_cfgs [cfg_dir]
"""

from __future__ import annotations

import os
import sys

HEADER = """\
[cfg_proto]
cfg_proto = proto/global.proto
cfg_proto_chunk = proto/global_chunk.proto

[exp]
cmd =
run_nn_script = run_nn
out_folder = exp/{exp_name}
seed = 2234
use_cuda = False
multi_gpu = False
save_gpumem = False
n_epochs_tr = {n_epochs}
"""

SGD_TAIL = """\
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False
"""

RMSPROP_TAIL = """\
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = rmsprop
opt_momentum = 0.0
opt_alpha = 0.95
opt_eps = 1e-8
opt_centered = False
opt_weight_decay = 0.0
"""


def dataset_block(
    idx, name, root, split, fea_name, fea_sub, cw, n_chunks,
    ali="dnn4_pretrain-dbn_dnn_ali", fea_opts=None, mono=False,
):
    if fea_opts is None:
        fea_opts = (
            f"apply-cmvn --utt2spk=ark:{root}/data/{split}/utt2spk "
            f"ark:{root}/{fea_sub}/cmvn_{split}.ark ark:- ark:- | "
            f"add-deltas --delta-order=2 ark:- ark:- |"
        )
    lab = f"""lab = lab_name=lab_cd
\tlab_folder={root}/exp/{ali}
\tlab_opts=ali-to-pdf
\tlab_count_file=auto
\tlab_data_folder={root}/data/{split}/
\tlab_graph={root}/exp/tri3/graph
"""
    if mono:
        lab = lab.rstrip("\n") + f"""
\tlab_name=lab_mono
\tlab_folder={root}/exp/{ali}
\tlab_opts=ali-to-phones --per-frame=true
\tlab_count_file=none
\tlab_data_folder={root}/data/{split}/
\tlab_graph={root}/exp/tri3/graph
"""
    return f"""
[dataset{idx}]
data_name = {name}
fea = fea_name={fea_name}
\tfea_lst={root}/data/{split}/feats.scp
\tfea_opts={fea_opts}
\tcw_left={cw}
\tcw_right={cw}

{lab}
n_chunks = {n_chunks}
"""


DATA_USE = """
[data_use]
train_with = {tr}
valid_with = {dev}
forward_with = {te}
"""

BATCHES = """
[batches]
batch_size_train = {bs}
max_seq_length_train = {msl}
increase_seq_length_train = {curr}
start_seq_len_train = 100
multply_factor_seq_len_train = 2
batch_size_valid = {bs_valid}
max_seq_length_valid = 1000
"""

FORWARD_DECODING = """
[forward]
forward_out = {fwd_out}
normalize_posteriors = True
normalize_with_counts_from = lab_cd
save_out_file = False
require_decoding = True

[decoding]
decoding_script_folder = kaldi_decoding_scripts/
decoding_script = decode_dnn.sh
decoding_proto = proto/decoding.proto
min_active = 200
max_active = 7000
max_mem = 50000000
beam = 13.0
latbeam = 8.0
acwt = {acwt}
max_arcs = -1
skip_scoring = false
scoring_script = local/score.sh
scoring_opts = "--min-lmwt 1 --max-lmwt 10"
norm_vars = False
"""


def mlp_arch(idx, name, lay, drop, bn, act, lr):
    n = len(lay.split(","))
    return f"""
[architecture{idx}]
arch_name = {name}
arch_proto = proto/MLP.proto
arch_library = tpukaldi.models
arch_class = MLP
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = False
dnn_lay = {lay}
dnn_drop = {drop}
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = {bn}
dnn_use_laynorm = {",".join(["False"] * n)}
dnn_act = {act}
""" + SGD_TAIL.format(lr=lr)


def recurrent_arch(idx, name, cls, prefix, lay, drop, bn, act, lr,
                   opt_tail=None, extra=""):
    n = len(lay.split(","))
    return f"""
[architecture{idx}]
arch_name = {name}
arch_proto = proto/{cls}.proto
arch_library = tpukaldi.models
arch_class = {cls}
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = True
{prefix}_lay = {lay}
{prefix}_drop = {drop}
{prefix}_use_laynorm_inp = False
{prefix}_use_batchnorm_inp = False
{prefix}_use_laynorm = {",".join(["False"] * n)}
{prefix}_use_batchnorm = {bn}
{prefix}_bidir = True
{prefix}_act = {act}
{prefix}_orthinit = True
{extra}""" + (opt_tail or RMSPROP_TAIL).format(lr=lr)


def model_block(lines, fwd_out):
    joined = "\n\t".join(lines)
    return f"""
[model]
model_proto = proto/model.proto
model = {joined}
"""


TIMIT_ALI = {"train": "dnn4_pretrain-dbn_dnn_ali",
             "dev": "dnn4_pretrain-dbn_dnn_ali_dev",
             "test": "dnn4_pretrain-dbn_dnn_ali_test"}


def timit_mlp_mfcc_basic(root="$KALDI_TIMIT"):
    cfg = HEADER.format(exp_name="TIMIT_MLP_mfcc_basic", n_epochs=24)
    for i, (name, split, nck) in enumerate(
        [("TIMIT_tr", "train", 5), ("TIMIT_dev", "dev", 1),
         ("TIMIT_test", "test", 1)], start=1):
        cfg += dataset_block(i, name, root, split, "mfcc", "mfcc", 5, nck,
                             ali=TIMIT_ALI[split])
    cfg += DATA_USE.format(tr="TIMIT_tr", dev="TIMIT_dev", te="TIMIT_test")
    cfg += BATCHES.format(bs=128, msl=1000, curr="False", bs_valid=128)
    cfg += mlp_arch(
        1, "MLP_layers1", "1024,1024,1024,1024,N_out_lab_cd",
        "0.15,0.15,0.15,0.15,0.0", "True,True,True,True,False",
        "relu,relu,relu,relu,softmax", 0.08,
    )
    cfg += model_block(
        ["out_dnn1=compute(MLP_layers1,mfcc)",
         "loss_final=cost_nll(out_dnn1,lab_cd)",
         "err_final=cost_err(out_dnn1,lab_cd)"],
        "out_dnn1",
    )
    cfg += FORWARD_DECODING.format(fwd_out="out_dnn1", acwt=0.2)
    return cfg


def timit_ligru_fmllr(root="$KALDI_TIMIT"):
    """The flagship: bidir Li-GRU 5x550 on fMLLR with cd+mono joint loss
    (mirrors reference TIMIT_liGRU_fmllr.cfg; PER ~14.2)."""
    cfg = HEADER.format(exp_name="TIMIT_liGRU_fmllr", n_epochs=24)
    for i, (name, split, nck) in enumerate(
        [("TIMIT_tr", "train", 5), ("TIMIT_dev", "dev", 1),
         ("TIMIT_test", "test", 1)], start=1):
        cfg += dataset_block(
            i, name, root, split, "fmllr", "fmllr", 0, nck, mono=True,
            ali=TIMIT_ALI[split],
            fea_opts=(
                f"apply-cmvn --utt2spk=ark:{root}/data/{split}/utt2spk "
                f"ark:{root}/fmllr/cmvn_{split}.ark ark:- ark:- | "
                f"add-deltas --delta-order=0 ark:- ark:- |"
            ),
        )
    cfg += DATA_USE.format(tr="TIMIT_tr", dev="TIMIT_dev", te="TIMIT_test")
    cfg += BATCHES.format(bs=8, msl=1000, curr="True", bs_valid=8)
    cfg += recurrent_arch(
        1, "liGRU_layers", "liGRU", "ligru", "550,550,550,550,550",
        "0.2,0.2,0.2,0.2,0.2", "True,True,True,True,True",
        "relu,relu,relu,relu,relu", 0.0004,
        extra="ligru_impl = auto\n",
    )
    cfg += mlp_arch(2, "MLP_layers", "N_out_lab_cd", "0.0", "False",
                    "softmax", 0.0004).replace("arch_opt = sgd",
                                               "arch_opt = sgd")
    cfg += mlp_arch(3, "MLP_layers2", "N_out_lab_mono", "0.0", "False",
                    "softmax", 0.0004)
    cfg += model_block(
        ["out_dnn1=compute(liGRU_layers,fmllr)",
         "out_dnn2=compute(MLP_layers,out_dnn1)",
         "out_dnn3=compute(MLP_layers2,out_dnn1)",
         "loss_mono=cost_nll(out_dnn3,lab_mono)",
         "loss_mono_w=mult_constant(loss_mono,1.0)",
         "loss_cd=cost_nll(out_dnn2,lab_cd)",
         "loss_final=sum(loss_cd,loss_mono_w)",
         "err_final=cost_err(out_dnn2,lab_cd)"],
        "out_dnn2",
    )
    cfg += FORWARD_DECODING.format(fwd_out="out_dnn2", acwt=0.2)
    return cfg


def timit_recurrent(cls, prefix, fea="fbank"):
    cfg = HEADER.format(exp_name=f"TIMIT_{cls}_{fea}", n_epochs=24)
    for i, (name, split, nck) in enumerate(
        [("TIMIT_tr", "train", 5), ("TIMIT_dev", "dev", 1),
         ("TIMIT_test", "test", 1)], start=1):
        cfg += dataset_block(i, name, "$KALDI_TIMIT", split, fea, fea, 0,
                             nck, ali=TIMIT_ALI[split])
    cfg += DATA_USE.format(tr="TIMIT_tr", dev="TIMIT_dev", te="TIMIT_test")
    cfg += BATCHES.format(bs=8, msl=1000, curr="True", bs_valid=8)
    cfg += recurrent_arch(
        1, f"{cls}_layers", cls, prefix, "550,550,550,550",
        "0.2,0.2,0.2,0.2", "True,True,True,True",
        "tanh,tanh,tanh,tanh", 0.0004,
    )
    cfg += mlp_arch(2, "MLP_layers", "N_out_lab_cd", "0.0", "False",
                    "softmax", 0.0004)
    cfg += model_block(
        [f"out_dnn1=compute({cls}_layers,{fea})",
         "out_dnn2=compute(MLP_layers,out_dnn1)",
         "loss_final=cost_nll(out_dnn2,lab_cd)",
         "err_final=cost_err(out_dnn2,lab_cd)"],
        "out_dnn2",
    )
    cfg += FORWARD_DECODING.format(fwd_out="out_dnn2", acwt=0.2)
    return cfg


def timit_sincnet_raw(root="$KALDI_TIMIT"):
    cfg = HEADER.format(exp_name="TIMIT_SincNet_raw", n_epochs=24)
    for i, (name, split, nck) in enumerate(
        [("TIMIT_tr", "train", 5), ("TIMIT_dev", "dev", 1),
         ("TIMIT_test", "test", 1)], start=1):
        cfg += dataset_block(
            i, name, root, split, "raw", "raw", 0, nck,
            fea_opts="copy-feats ark:- ark:- |", ali=TIMIT_ALI[split],
        )
    cfg = cfg.replace("data/train/feats.scp", "data/raw_200ms/train/feats_raw.scp")
    cfg = cfg.replace("data/dev/feats.scp", "data/raw_200ms/dev/feats_raw.scp")
    cfg = cfg.replace("data/test/feats.scp", "data/raw_200ms/test/feats_raw.scp")
    cfg += DATA_USE.format(tr="TIMIT_tr", dev="TIMIT_dev", te="TIMIT_test")
    cfg += BATCHES.format(bs=128, msl=1000, curr="False", bs_valid=128)
    cfg += f"""
[architecture1]
arch_name = SincNet_layers
arch_proto = proto/SincNet.proto
arch_library = tpukaldi.models
arch_class = SincNet
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = False
sinc_n_filt = 80,60,60
sinc_len_filt = 129,5,3
sinc_max_pool_len = 3,3,3
sinc_sample_rate = 16000
sinc_min_low_hz = 50
sinc_min_band_hz = 50
sinc_use_laynorm_inp = False
sinc_use_batchnorm_inp = False
sinc_use_laynorm = True,True,True
sinc_use_batchnorm = False,False,False
sinc_act = leaky_relu,leaky_relu,leaky_relu
sinc_drop = 0.0,0.0,0.0
""" + SGD_TAIL.format(lr=0.08)
    cfg += mlp_arch(
        2, "MLP_layers", "2048,2048,N_out_lab_cd", "0.15,0.15,0.0",
        "True,True,False", "leaky_relu,leaky_relu,softmax", 0.08,
    )
    cfg += model_block(
        ["out_cnn=compute(SincNet_layers,raw)",
         "out_dnn=compute(MLP_layers,out_cnn)",
         "loss_final=cost_nll(out_dnn,lab_cd)",
         "err_final=cost_err(out_dnn,lab_cd)"],
        "out_dnn",
    )
    cfg += FORWARD_DECODING.format(fwd_out="out_dnn", acwt=0.2)
    return cfg


def librispeech_ligru_fmllr(root="$KALDI_LIBRI"):
    cfg = HEADER.format(exp_name="libri_liGRU_fmllr", n_epochs=8)
    for i, (name, split, nck) in enumerate(
        [("libri_tr", "train_clean_100", 40), ("libri_dev", "dev_clean", 2),
         ("libri_test", "test_clean", 2)], start=1):
        cfg += dataset_block(
            i, name, root, split, "fmllr", "fmllr", 0, nck,
            ali="tri4b_ali_clean_100",
        )
    cfg += DATA_USE.format(tr="libri_tr", dev="libri_dev", te="libri_test")
    cfg += BATCHES.format(bs=16, msl=500, curr="True", bs_valid=16)
    cfg += recurrent_arch(
        1, "liGRU_layers", "liGRU", "ligru", "550,550,550,550,550",
        "0.2,0.2,0.2,0.2,0.2", "True,True,True,True,True",
        "relu,relu,relu,relu,relu", 0.0004,
        extra="ligru_impl = auto\n",
    )
    cfg += mlp_arch(2, "MLP_layers", "N_out_lab_cd", "0.0", "False",
                    "softmax", 0.0004)
    cfg += model_block(
        ["out_dnn1=compute(liGRU_layers,fmllr)",
         "out_dnn2=compute(MLP_layers,out_dnn1)",
         "loss_final=cost_nll(out_dnn2,lab_cd)",
         "err_final=cost_err(out_dnn2,lab_cd)"],
        "out_dnn2",
    )
    cfg += FORWARD_DECODING.format(fwd_out="out_dnn2", acwt=0.1)
    return cfg


def dirha_qlstm_mfcc(root="$KALDI_DIRHA"):
    cfg = HEADER.format(exp_name="DIRHA_QLSTM_mfcc", n_epochs=24)
    for i, (name, split, nck) in enumerate(
        [("DIRHA_tr", "train", 5), ("DIRHA_dev", "dev", 1),
         ("DIRHA_test", "test", 1)], start=1):
        cfg += dataset_block(i, name, root, split, "mfcc", "mfcc", 2, nck)
    cfg += DATA_USE.format(tr="DIRHA_tr", dev="DIRHA_dev", te="DIRHA_test")
    cfg += BATCHES.format(bs=16, msl=1000, curr="False", bs_valid=16)
    cfg += f"""
[architecture1]
arch_name = QLSTM_layers
arch_proto = proto/QLSTM.proto
arch_library = tpukaldi.models
arch_class = QLSTM
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = True
lstm_lay = 1024,1024
lstm_drop = 0.2,0.2
lstm_bidir = True
lstm_act = tanh,tanh
quaternion_init = quaternion
autograd = False
""" + RMSPROP_TAIL.format(lr=0.0016)
    cfg += mlp_arch(2, "MLP_layers", "N_out_lab_cd", "0.0", "False",
                    "softmax", 0.0016)
    cfg += model_block(
        ["out_dnn1=compute(QLSTM_layers,mfcc)",
         "out_dnn2=compute(MLP_layers,out_dnn1)",
         "loss_final=cost_nll(out_dnn2,lab_cd)",
         "err_final=cost_err(out_dnn2,lab_cd)"],
        "out_dnn2",
    )
    cfg += FORWARD_DECODING.format(fwd_out="out_dnn2", acwt=0.1)
    return cfg


def dirha_fusion_6ch(root="$KALDI_DIRHA"):
    cfg = HEADER.format(exp_name="DIRHA_fusionRNN_mfcc_6ch", n_epochs=24)
    for i, (name, split, nck) in enumerate(
        [("DIRHA_tr", "train", 5), ("DIRHA_dev", "dev", 1),
         ("DIRHA_test", "test", 1)], start=1):
        cfg += dataset_block(i, name, root, split, "mfcc_6ch", "mfcc", 0, nck)
    cfg += DATA_USE.format(tr="DIRHA_tr", dev="DIRHA_dev", te="DIRHA_test")
    cfg += BATCHES.format(bs=16, msl=1000, curr="False", bs_valid=16)
    cfg += f"""
[architecture1]
arch_name = fusionRNN_layers
arch_proto = proto/fusionRNN.proto
arch_library = tpukaldi.models
arch_class = fusionRNN_jit
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = True
fusionRNN_lay = 512,512,512,512
fusionRNN_drop = 0.2,0.2,0.2,0.2
fusionRNN_bidir = True
fusionRNN_act = prelu,prelu,prelu,prelu
fusionRNN_do_fusion = True
fusionRNN_fusion_layer_size = 3072
fusionRNN_number_of_mic = 6
fusionRNN_fusion_act = prelu
fusionRNN_fusion_reduce = sum
batches = 16
""" + RMSPROP_TAIL.format(lr=0.0004)
    cfg += mlp_arch(2, "MLP_layers", "N_out_lab_cd", "0.0", "False",
                    "softmax", 0.0004)
    cfg += model_block(
        ["out_dnn1=compute(fusionRNN_layers,mfcc_6ch)",
         "out_dnn2=compute(MLP_layers,out_dnn1)",
         "loss_final=cost_nll(out_dnn2,lab_cd)",
         "err_final=cost_err(out_dnn2,lab_cd)"],
        "out_dnn2",
    )
    cfg += FORWARD_DECODING.format(fwd_out="out_dnn2", acwt=0.1)
    return cfg


GENERATORS = {
    "TIMIT/MLP_mfcc_basic.cfg": timit_mlp_mfcc_basic,
    "TIMIT/liGRU_fmllr.cfg": timit_ligru_fmllr,
    "TIMIT/LSTM_fbank.cfg": lambda: timit_recurrent("LSTM", "lstm"),
    "TIMIT/GRU_fbank.cfg": lambda: timit_recurrent("GRU", "gru"),
    "TIMIT/RNN_fbank.cfg": lambda: timit_recurrent("RNN", "rnn"),
    "TIMIT/minimalGRU_fbank.cfg": lambda: timit_recurrent(
        "minimalGRU", "minimalgru"),
    "TIMIT/SincNet_raw.cfg": timit_sincnet_raw,
    "Librispeech/liGRU_fmllr.cfg": librispeech_ligru_fmllr,
    "DIRHA/QLSTM_mfcc.cfg": dirha_qlstm_mfcc,
    "DIRHA/fusionRNN_mfcc_6ch.cfg": dirha_fusion_6ch,
}


def generate_all(cfg_dir: str) -> list:
    paths = []
    for rel, gen in GENERATORS.items():
        path = os.path.join(cfg_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(gen())
        paths.append(path)
    return paths


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    cfg_dir = argv[0] if argv else "cfg"
    for p in generate_all(cfg_dir):
        print(p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
