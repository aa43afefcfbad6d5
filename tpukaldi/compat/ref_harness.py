"""Pipeline-to-pipeline parity harness against the reference pytorch-kaldi.

The north-star contract (BASELINE.json) is posterior-ark parity: the
prior-normalized log posteriors tpukaldi emits must match what the
reference's own forward pipeline (`core.run_nn`, reference core.py:438-671:
chunk load -> splice -> per-chunk CMVN -> whole-utterance batch-1 forward ->
`out - log(counts/sum(counts))` -> write_mat ark) produces for the same
corpus and weights.  Until round 3 that was only proven piecewise; this
module measures the COMPOSITION:

1. `build_parity_tree` synthesizes a Kaldi-shaped corpus the REFERENCE can
   consume: feats ark/scp, utt2spk, speaker cmvn stats, and real
   transition-id alignments (`ali.1.gz` + binary `final.mdl` written by
   `tpukaldi.io.transition_model.write_transition_model`).
2. `make_stub_bin_dir` ships the Kaldi executables the reference shells out
   to (`copy-feats`/`apply-cmvn`/`add-deltas`/`ali-to-pdf`/... —
   reference data_io.py:39-51) as thin CLIs over tpukaldi's own
   golden-tested codecs, so the reference runs unmodified in an image with
   no Kaldi.
3. `write_parity_cfg` emits one experiment cfg in the shared INI dialect,
   with only `arch_library` switched per side (`neural_networks` for the
   reference torch zoo, `tpukaldi.models` for ours).
4. `run_reference_experiment` executes the reference's own
   `run_exp.py` (subprocess, torch CPU) end to end.
5. `import_final_checkpoints` converts the reference's trained
   `final_<arch>.pkl` into native ckpts, so tpukaldi's production-mode
   forward runs with bit-identical weights.
6. `compare_posterior_arks` reports the per-utterance max-abs-diff.

Used by tests/test_posterior_parity.py; also a user-facing migration check:

    python -m tpukaldi.compat.ref_harness /tmp/parity --arch MLP
"""

from __future__ import annotations

import os
import subprocess
import sys
from dataclasses import dataclass
from typing import Dict, Iterable, List, Tuple

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE_DIR = os.environ.get("TPUKALDI_REFERENCE_DIR", "/root/reference")

# ---------------------------------------------------------------------------
# corpus synthesis (reference-consumable: real ali.gz + final.mdl)
# ---------------------------------------------------------------------------


def _make_transition_model(n_phones: int):
    """3-state Bakis HMM per phone, one pdf per state (n_pdfs = 3*n_phones),
    in the layout `write_transition_model` serializes."""
    from ..io.transition_model import HmmState, TransitionModel

    entry = [
        HmmState(0, 0, [(0, 0.5), (1, 0.5)]),
        HmmState(1, 1, [(1, 0.5), (2, 0.5)]),
        HmmState(2, 2, [(2, 0.5), (3, 0.5)]),
    ]
    phones = list(range(1, n_phones + 1))
    tuples = []
    pdf = 0
    for p in phones:
        for state in range(3):
            tuples.append((p, state, pdf, pdf))
            pdf += 1
    id2pdf = [0]
    id2phone = [0]
    for phone, state, fwd, selfp in tuples:
        for nxt, _ in entry[state].transitions:
            id2pdf.append(selfp if nxt == state else fwd)
            id2phone.append(phone)
    return TransitionModel(
        phones=phones,
        topology={p: entry for p in phones},
        tuples=tuples,
        id2pdf=np.asarray(id2pdf),
        id2phone=np.asarray(id2phone),
    )


@dataclass
class ParityTree:
    root: str
    n_pdfs: int
    feat_dim: int
    counts_file: str
    splits: Tuple[str, ...]

    def scp(self, split: str) -> str:
        return os.path.join(self.root, "data", split, "feats_mfcc.scp")

    def utt2spk(self, split: str) -> str:
        return os.path.join(self.root, "data", split, "utt2spk")

    def cmvn(self, split: str) -> str:
        return os.path.join(self.root, "mfcc", f"cmvn_{split}.ark")

    def alidir(self, split: str) -> str:
        return os.path.join(self.root, "exp", f"ali_{split}")


def build_parity_tree(
    root: str,
    n_phones: int = 3,
    feat_dim: int = 13,
    n_utts=(12, 4, 6),
    min_len: int = 40,
    max_len: int = 120,
    seed: int = 1234,
    noise: float = 0.5,
    splits=("train", "dev", "test"),
) -> ParityTree:
    import gzip

    from ..io import ArkScpWriter, compute_cmvn_stats, save_counts, write_mat
    from ..io import kaldi_io as kio
    from ..io.transition_model import write_transition_model

    tm = _make_transition_model(n_phones)
    n_pdfs = 3 * n_phones
    # one representative transition-id per pdf (its self-loop): frame-level
    # alignments of these ids map back to the pdf through ali-to-pdf
    pdf2tid = {}
    for tid, pdf in enumerate(np.asarray(tm.id2pdf)[1:], start=1):
        pdf2tid.setdefault(int(pdf), tid)

    rng = np.random.default_rng(seed)
    means = rng.standard_normal((n_pdfs, feat_dim)) * 2.0
    counts = np.zeros(n_pdfs)
    os.makedirs(root, exist_ok=True)
    for split, n in zip(splits, n_utts):
        d = os.path.join(root, "data", split)
        ali = os.path.join(root, "exp", f"ali_{split}")
        os.makedirs(d, exist_ok=True)
        os.makedirs(ali, exist_ok=True)
        os.makedirs(os.path.join(root, "mfcc"), exist_ok=True)
        write_transition_model(tm, os.path.join(ali, "final.mdl"))
        cmvn: Dict[str, np.ndarray] = {}
        with ArkScpWriter(
            os.path.join(d, "feats_mfcc.ark"), os.path.join(d, "feats_mfcc.scp")
        ) as w, open(os.path.join(d, "utt2spk"), "w") as u2s, gzip.open(
            os.path.join(ali, "ali.1.gz"), "wb"
        ) as af:
            for i in range(n):
                T = int(rng.integers(min_len, max_len))
                pdfs: List[int] = []
                while len(pdfs) < T:
                    pdfs.extend([int(rng.integers(0, n_pdfs))]
                                * int(rng.integers(3, 12)))
                pdfs_arr = np.asarray(pdfs[:T])
                fea = means[pdfs_arr] + noise * rng.standard_normal((T, feat_dim))
                key = f"{split}spk{i % 2}_u{i:03d}"
                spk = f"{split}spk{i % 2}"
                w.write(key, fea.astype(np.float32))
                u2s.write(f"{key} {spk}\n")
                tids = np.asarray([pdf2tid[int(p)] for p in pdfs_arr])
                kio.write_vec_int(af, tids, key=key)
                cmvn[spk] = cmvn.get(spk, 0) + compute_cmvn_stats(fea)
                if split == splits[0]:
                    counts += np.bincount(pdfs_arr, minlength=n_pdfs)
        with open(os.path.join(root, "mfcc", f"cmvn_{split}.ark"), "wb") as cf:
            for spk, st in cmvn.items():
                write_mat(cf, st, key=spk)
    counts_file = os.path.join(root, "counts")
    save_counts(np.maximum(counts, 1.0), counts_file)
    return ParityTree(
        root=root, n_pdfs=n_pdfs, feat_dim=feat_dim,
        counts_file=counts_file, splits=tuple(splits),
    )


# ---------------------------------------------------------------------------
# Kaldi-binary stubs backed by tpukaldi codecs
# ---------------------------------------------------------------------------

STUB_NAMES = (
    "copy-feats", "wav-copy", "apply-cmvn", "add-deltas",
    "ali-to-pdf", "ali-to-phones", "hmm-info",
)

_STUB_TEMPLATE = """#!{python}
import sys
sys.path.insert(0, {repo!r})
from tpukaldi.compat.ref_harness import stub_main
sys.exit(stub_main({name!r}, sys.argv[1:]))
"""


def make_stub_bin_dir(dst: str) -> str:
    """Write PATH-able stand-ins for the Kaldi binaries the reference
    pipes through (data_io.py:39-51, cfg fea_opts).  Each is a tiny CLI
    over the SAME tpukaldi codec/feature functions the native pipeline
    uses, so both frameworks see bit-identical upstream data."""
    os.makedirs(dst, exist_ok=True)
    for name in STUB_NAMES:
        path = os.path.join(dst, name)
        with open(path, "w") as f:
            f.write(_STUB_TEMPLATE.format(
                python=sys.executable, repo=REPO, name=name))
        os.chmod(path, 0o755)
    return dst


def _positional(argv: List[str]) -> List[str]:
    return [a for a in argv if not a.startswith("--")]


def _open_rspec(spec: str):
    """Yield (key, mat) from an ark/scp rspecifier ('ark:-' = stdin)."""
    from ..io import kaldi_io as kio

    if spec.startswith("scp"):
        return kio.read_mat_scp(spec.split(":", 1)[1])
    path = spec.split(":", 1)[1] if ":" in spec else spec
    return kio.read_mat_ark(sys.stdin.buffer if path == "-" else path)


def _out_fd(spec: str):
    path = spec.split(":", 1)[1] if ":" in spec else spec
    return sys.stdout.buffer if path == "-" else open(path, "wb")


def stub_main(name: str, argv: List[str]) -> int:
    """Dispatch target for the generated stub executables."""
    from ..io import kaldi_io as kio

    pos = _positional(argv)
    if name == "copy-feats":
        src, dst = pos[0], pos[1]
        out = _out_fd(dst)
        for k, m in _open_rspec(src):
            kio.write_mat(out, m, key=k)
        out.flush()
        return 0
    if name == "wav-copy":
        src, dst = pos[0], pos[1]
        out = _out_fd(dst)
        if src.startswith("scp"):
            it = kio.read_vec_flt_scp(src.split(":", 1)[1])
        else:
            it = kio.read_vec_flt_ark(src.split(":", 1)[1])
        for k, v in it:
            kio.write_vec_flt(out, v, key=k)
        out.flush()
        return 0
    if name in ("apply-cmvn", "add-deltas"):
        from ..io import pipeline as pl

        # reuse the native fea_opts stages verbatim: semantics and float
        # behavior identical to tpukaldi's in-process path by construction
        if name == "apply-cmvn":
            # drop the trailing <in> <out> rspecifiers; what remains is
            # --opts plus the cmvn-stats rspecifier _make_apply_cmvn wants
            stage = pl._make_apply_cmvn(argv[:-2])
        else:
            stage = pl._make_add_deltas(argv)
        out = _out_fd(pos[-1])
        for k, m in _open_rspec(pos[-2]):
            kio.write_mat(out, stage(k, m), key=k)
        out.flush()
        return 0
    if name in ("ali-to-pdf", "ali-to-phones"):
        from ..io.transition_model import read_transition_model

        mdl, src, dst = pos[0], pos[1], pos[2]
        tm = read_transition_model(mdl)
        fn = (tm.transition_ids_to_pdfs if name == "ali-to-pdf"
              else tm.transition_ids_to_phones)
        src_path = src.split(":", 1)[1]
        fd = sys.stdin.buffer if src_path == "-" else open(src_path, "rb")
        out = _out_fd(dst)
        for k, v in kio.read_vec_int_ark(fd):
            kio.write_vec_int(out, fn(v), key=k)
        out.flush()
        return 0
    if name == "hmm-info":
        from ..io.transition_model import hmm_info

        for k, v in hmm_info(pos[0]).items():
            print(f"{k} {v}")
        return 0
    print(f"stub {name}: unsupported invocation {argv}", file=sys.stderr)
    return 1


# ---------------------------------------------------------------------------
# shared-dialect experiment cfg
# ---------------------------------------------------------------------------

_MLP_ARCH = """[architecture1]
arch_name = MLP_layers1
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain1}
arch_freeze = False
arch_seq_model = False
dnn_lay = 24,24,{n_pdfs}
dnn_drop = 0.0,0.0,0.0
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = True,True,False
dnn_use_laynorm = False,False,False
dnn_act = relu,relu,softmax
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False
"""

# frame-mode CNN over the spliced feature vector treated as a 1-D signal,
# mirroring cfg/TIMIT_baselines/TIMIT_CNN_fbank.cfg (laynorm per layer, relu;
# its (filt,time)-shaped LayerNorm is the reference's quirky recipe path) +
# the MLP softmax classifier.  Filter/pool sizes are scaled down to the
# synthetic tree's 195-dim spliced input (13 mfcc x3 deltas x5 splice).
_CNN_ARCH = """[architecture1]
arch_name = CNN_layers
arch_proto = proto/CNN.proto
arch_library = {library}
arch_class = CNN
arch_pretrain_file = {pretrain1}
arch_freeze = False
arch_seq_model = False
cnn_N_filt = 5,6
cnn_len_filt = 12,5
cnn_max_pool_len = 3,2
cnn_use_laynorm_inp = False
cnn_use_batchnorm_inp = False
cnn_use_laynorm = True,True
cnn_use_batchnorm = False,False
cnn_act = relu,relu
cnn_drop = 0.0,0.0
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture2]
arch_name = MLP_softmax
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain2}
arch_freeze = False
arch_seq_model = False
dnn_lay = {n_pdfs}
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

# raw-waveform SincNet, mirroring cfg/TIMIT_baselines/TIMIT_SincNet_raw.cfg
# (sinc front-end + per-layer (filt,time) laynorm + relu, rmsprop-trainable,
# arch_name CNN_layers exactly like the recipe) + the MLP softmax head.
# Filter/pool sizes are scaled to the synthetic tree's 400-sample windows
# (the recipe's save_raw_fea.py windows wavs into (frames, 3200) arks and
# feeds them as frame features with cw 0/0 — same composition, smaller dim).
_SINC_ARCH = """[architecture1]
arch_name = CNN_layers
arch_proto = proto/SincNet.proto
arch_library = {library}
arch_class = SincNet
arch_pretrain_file = {pretrain1}
arch_freeze = False
arch_seq_model = False
sinc_n_filt = 8,6,6
sinc_len_filt = 65,5,3
sinc_max_pool_len = 3,2,2
sinc_use_laynorm_inp = True
sinc_use_batchnorm_inp = False
sinc_use_laynorm = True,True,True
sinc_use_batchnorm = False,False,False
sinc_act = relu,relu,relu
sinc_drop = 0.0,0.0,0.0
sinc_sample_rate = 16000
sinc_min_low_hz = 50
sinc_min_band_hz = 50
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture2]
arch_name = MLP_softmax
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain2}
arch_freeze = False
arch_seq_model = False
dnn_lay = {n_pdfs}
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

# autoencoder (TIMIT_MLP_fbank_autoencoder.cfg): bn-relu + linear
# bottleneck encoder, decoder reconstructing the spliced features,
# `mse(dec_out, fbank)` loss, forward_out = the UN-normalized bottleneck
# (normalize_posteriors=False) — measures the mse DSL op, cost-vs-feature
# wiring, and the raw forward-ark path
_AE_ARCH = """[architecture1]
arch_name = MLP_encoder
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain1}
arch_freeze = False
arch_seq_model = False
dnn_lay = 24,8
dnn_drop = 0.0,0.0
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = True,True
dnn_use_laynorm = False,False
dnn_act = relu,linear
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture2]
arch_name = MLP_decoder
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain2}
arch_freeze = False
arch_seq_model = False
dnn_lay = 24,{spliced_dim}
dnn_drop = 0.0,0.0
dnn_use_batchnorm = True,False
dnn_use_laynorm = False,False
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_act = relu,linear
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False
"""

# the published-best TIMIT ensemble (13.8% PER): 3 feature streams
# (mfcc+deltas / fbank / fmllr) concatenated, MLP -> bidir liGRU(bn) ->
# MLP -> two softmax heads (cd + mono) joined by
# `sum(cost_nll_cd, mult_constant(cost_nll_mono, 1.0))`
# (cfg/TIMIT_baselines/TIMIT_mfcc_fbank_fmllr_liGRU_best.cfg) — the richest
# DSL/loader composition in the reference, scaled to parity size
_BEST_ARCH = """[architecture1]
arch_name = MLP_layers_first
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain1}
arch_freeze = False
arch_seq_model = False
dnn_lay = 16
dnn_drop = 0.0
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = True
dnn_use_laynorm = False
dnn_act = leaky_relu
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture2]
arch_name = liGRU_layers
arch_proto = proto/liGRU.proto
arch_library = {library}
arch_class = liGRU
arch_pretrain_file = {pretrain2}
arch_freeze = False
arch_seq_model = True
ligru_lay = 16,16
ligru_drop = 0.0,0.0
ligru_use_laynorm_inp = False
ligru_use_batchnorm_inp = False
ligru_use_laynorm = False,False
ligru_use_batchnorm = True,True
ligru_bidir = True
ligru_act = relu,relu
ligru_orthinit = True
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture3]
arch_name = MLP_layers_second
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain3}
arch_freeze = False
arch_seq_model = False
dnn_lay = 16
dnn_drop = 0.0
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = True
dnn_use_laynorm = False
dnn_act = leaky_relu
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture4]
arch_name = MLP_layers_last
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain4}
arch_freeze = False
arch_seq_model = False
dnn_lay = {n_pdfs}
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

[architecture5]
arch_name = MLP_layers_last2
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain5}
arch_freeze = False
arch_seq_model = False
dnn_lay = {n_mono}
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

# joint enhancement+ASR training (TIMIT_rev/TIMIT_joint_training_liGRU_
# fbank.cfg): reverberated fbank -> liGRU_SE -> linear MLP_SE enhancement
# (mse against the CLEAN fbank stream) -> liGRU_SR -> cd + mono heads,
# 3-way summed loss — measures cost-against-a-second-feature-stream and
# chained recurrent stacks
_REV_ARCH = """[architecture1]
arch_name = liGRU_SE
arch_proto = proto/liGRU.proto
arch_library = {library}
arch_class = liGRU
arch_pretrain_file = {pretrain1}
arch_freeze = False
arch_seq_model = True
ligru_lay = 16,16
ligru_drop = 0.0,0.0
ligru_use_laynorm_inp = False
ligru_use_batchnorm_inp = False
ligru_use_laynorm = False,False
ligru_use_batchnorm = True,True
ligru_bidir = True
ligru_act = relu,relu
ligru_orthinit = True
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture2]
arch_name = MLP_SE
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain2}
arch_freeze = False
arch_seq_model = False
dnn_lay = {fea_dim}
dnn_drop = 0.0
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = False
dnn_use_laynorm = False
dnn_act = linear
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture3]
arch_name = liGRU_SR
arch_proto = proto/liGRU.proto
arch_library = {library}
arch_class = liGRU
arch_pretrain_file = {pretrain3}
arch_freeze = False
arch_seq_model = True
ligru_lay = 16,16
ligru_drop = 0.0,0.0
ligru_use_laynorm_inp = False
ligru_use_batchnorm_inp = False
ligru_use_laynorm = False,False
ligru_use_batchnorm = True,True
ligru_bidir = True
ligru_act = relu,relu
ligru_orthinit = True
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture4]
arch_name = MLP_layers
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain4}
arch_freeze = False
arch_seq_model = False
dnn_lay = {n_pdfs}
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

[architecture5]
arch_name = MLP_layers2
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain5}
arch_freeze = False
arch_seq_model = False
dnn_lay = {n_mono}
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

# quaternion LSTM over 4 concatenated mfcc streams, mirroring
# cfg/DIRHA_baselines/DIRHA_QLSTM_MFCC.cfg (arch_library
# quaternion_neural_networks, tanh acts, bidir, MLP softmax head).
# autograd=True picks the reference's QuaternionLinearAutograd path —
# same forward function as QuaternionLinear, just torch-autograd
# gradients (quaternion_neural_networks.py:83-110), and much faster on
# CPU for the 1-epoch parity train.
_QLSTM_ARCH = """[architecture1]
arch_name = QLSTM
arch_proto = proto/QLSTM.proto
arch_library = {qlibrary}
arch_class = QLSTM
arch_pretrain_file = {pretrain1}
arch_freeze = False
arch_seq_model = True
lstm_lay = 8,8
lstm_drop = 0.0,0.0
lstm_bidir = True
lstm_act = tanh,tanh
quaternion_init = quaternion
autograd = True
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture2]
arch_name = MLP_softmax
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain2}
arch_freeze = False
arch_seq_model = False
dnn_lay = {n_pdfs}
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

_RECURRENT_ARCH = """[architecture1]
arch_name = {cls}_layers
arch_proto = proto/{cls}.proto
arch_library = {{library}}
arch_class = {cls}
arch_pretrain_file = {{pretrain1}}
arch_freeze = False
arch_seq_model = True
{prefix}_lay = 16,16
{prefix}_drop = 0.0,0.0
{prefix}_use_laynorm_inp = False
{prefix}_use_batchnorm_inp = False
{prefix}_use_laynorm = False,False
{prefix}_use_batchnorm = True,True
{prefix}_bidir = True
{prefix}_act = {act},{act}
{prefix}_orthinit = True
arch_lr = {{lr}}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture2]
arch_name = MLP_softmax
arch_proto = proto/MLP.proto
arch_library = {{library}}
arch_class = MLP
arch_pretrain_file = {{pretrain2}}
arch_freeze = False
arch_seq_model = False
dnn_lay = {{n_pdfs}}
dnn_drop = 0.0
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = False
dnn_use_laynorm = False
dnn_act = softmax
arch_lr = {{lr}}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False
"""

# fusionRNN (DIRHA_fusionRNN_MFCC_6ch.cfg shape, scaled down): 2 fused
# bidirectional Li-GRU layers, layer 0 a shared-weight 3-"mic" fusion over
# the spliced mfcc stream.  tpukaldi-side ONLY: the reference's
# fusionRNN_jit hard-codes .cuda() (neural_networks.py:757,category init)
# so it cannot run on this CPU-only torch — the composition is instead
# regression-locked against recorded goldens (tests/test_posterior_parity).
_FUSION_ARCH = """[architecture1]
arch_name = fusionRNN_layers
arch_proto = proto/fusionRNN.proto
arch_library = {library}
arch_class = fusionRNN
arch_pretrain_file = {pretrain1}
arch_freeze = False
arch_seq_model = True
fusionrnn_lay = 16,16
fusionrnn_drop = 0.0,0.0
fusionrnn_bidir = True
fusionrnn_act = relu,relu
fusionrnn_do_fusion = True
fusionrnn_fusion_layer_size = 48
fusionrnn_number_of_mic = 3
fusionrnn_fusion_act = prelu
fusionrnn_fusion_reduce = sum
arch_lr = {lr}
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[architecture2]
arch_name = MLP_softmax
arch_proto = proto/MLP.proto
arch_library = {library}
arch_class = MLP
arch_pretrain_file = {pretrain2}
arch_freeze = False
arch_seq_model = False
dnn_lay = {n_pdfs}
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

# recurrent families the harness can drive through the reference:
# class name -> (option prefix, activation)
RECURRENT_SPECS = {
    "liGRU": ("ligru", "relu"),
    "GRU": ("gru", "relu"),
    "LSTM": ("lstm", "tanh"),
    "RNN": ("rnn", "tanh"),
    "minimalGRU": ("minimalgru", "relu"),
}

_MODEL = {
    "MLP": (
        "out_dnn1=compute(MLP_layers1,mfcc)\n"
        "\tloss_final=cost_nll(out_dnn1,lab_cd)\n"
        "\terr_final=cost_err(out_dnn1,lab_cd)",
        "out_dnn1",
    ),
}
_MODEL["CNN"] = (
    "out_dnn1=compute(CNN_layers,mfcc)\n"
    "\tout_dnn2=compute(MLP_softmax,out_dnn1)\n"
    "\tloss_final=cost_nll(out_dnn2,lab_cd)\n"
    "\terr_final=cost_err(out_dnn2,lab_cd)",
    "out_dnn2",
)
# the autoencoder graph (TIMIT_MLP_fbank_autoencoder.cfg [model]):
# mse against the input features, err against the cd labels
_MODEL["ae"] = (
    "enc_out=compute(MLP_encoder,mfcc)\n"
    "\tdec_out=compute(MLP_decoder,enc_out)\n"
    "\tloss_final=mse(dec_out,mfcc)\n"
    "\terr_final=cost_err(dec_out,lab_cd)",
    "enc_out",
)

# the joint enhancement+ASR graph verbatim (TIMIT_rev [model]); decoding
# consumes out_dnn3 (the cd head); the harness tree backs both fbank
# streams with the same ark, so the mse enhancement target is exact
_MODEL["rev"] = (
    "out_dnn1=compute(liGRU_SE,fbankrev)\n"
    "\tout_dnn_SE=compute(MLP_SE,out_dnn1)\n"
    "\tout_dnn2=compute(liGRU_SR,out_dnn_SE)\n"
    "\tout_dnn3=compute(MLP_layers,out_dnn2)\n"
    "\tout_dnn4=compute(MLP_layers2,out_dnn2)\n"
    "\tloss_mono=cost_nll(out_dnn4,lab_mono)\n"
    "\tloss_mono_w=mult_constant(loss_mono,1.0)\n"
    "\tloss_se=mse(out_dnn_SE,fbankclean)\n"
    "\tloss_se_w=mult_constant(loss_se,1.0)\n"
    "\tloss_cd=cost_nll(out_dnn3,lab_cd)\n"
    "\tloss_sum1=sum(loss_cd,loss_mono_w)\n"
    "\tloss_final=sum(loss_sum1,loss_se_w)\n"
    "\terr_final=cost_err(out_dnn3,lab_cd)",
    "out_dnn3",
)

# the best-ensemble model graph verbatim
# (TIMIT_mfcc_fbank_fmllr_liGRU_best.cfg [model]); decoding consumes the
# cd head (out_dnn4), the mono head only shapes the joint loss
_MODEL["best"] = (
    "conc1=concatenate(mfcc,fbank)\n"
    "\tconc2=concatenate(conc1,fmllr)\n"
    "\tout_dnn1=compute(MLP_layers_first,conc2)\n"
    "\tout_dnn2=compute(liGRU_layers,out_dnn1)\n"
    "\tout_dnn3=compute(MLP_layers_second,out_dnn2)\n"
    "\tout_dnn4=compute(MLP_layers_last,out_dnn3)\n"
    "\tout_dnn5=compute(MLP_layers_last2,out_dnn3)\n"
    "\tloss_mono=cost_nll(out_dnn5,lab_mono)\n"
    "\tloss_mono_w=mult_constant(loss_mono,1.0)\n"
    "\tloss_cd=cost_nll(out_dnn4,lab_cd)\n"
    "\tloss_final=sum(loss_cd,loss_mono_w)\n"
    "\terr_final=cost_err(out_dnn4,lab_cd)",
    "out_dnn4",
)

# the DIRHA QLSTM recipe concatenates 4 microphone mfcc streams before the
# quaternion recurrence (DIRHA_QLSTM_MFCC.cfg [model]) — this also measures
# the multi-stream `concatenate` DSL composition across both pipelines
_MODEL["QLSTM"] = (
    "conc1=concatenate(mfccLA1,mfccLA2)\n"
    "\tconc2=concatenate(conc1,mfccLA3)\n"
    "\tconc3=concatenate(conc2,mfccLA4)\n"
    "\tout_dnn1=compute(QLSTM,conc3)\n"
    "\tout_dnn2=compute(MLP_softmax,out_dnn1)\n"
    "\tloss_final=cost_nll(out_dnn2,lab_cd)\n"
    "\terr_final=cost_err(out_dnn2,lab_cd)",
    "out_dnn2",
)

# raw windows go straight into the sinc front-end: no fea_opts, cw 0/0
# (TIMIT_SincNet_raw.cfg datasets)
_MODEL["SincNet"] = (
    "out_dnn1=compute(CNN_layers,raw)\n"
    "\tout_dnn2=compute(MLP_softmax,out_dnn1)\n"
    "\tloss_final=cost_nll(out_dnn2,lab_cd)\n"
    "\terr_final=cost_err(out_dnn2,lab_cd)",
    "out_dnn2",
)
for _cls in RECURRENT_SPECS:
    _MODEL[_cls] = (
        f"out_dnn1=compute({_cls}_layers,mfcc)\n"
        "\tout_dnn2=compute(MLP_softmax,out_dnn1)\n"
        "\tloss_final=cost_nll(out_dnn2,lab_cd)\n"
        "\terr_final=cost_err(out_dnn2,lab_cd)",
        "out_dnn2",
    )
_MODEL["fusionRNN"] = (
    "out_dnn1=compute(fusionRNN_layers,mfcc)\n"
    "\tout_dnn2=compute(MLP_softmax,out_dnn1)\n"
    "\tloss_final=cost_nll(out_dnn2,lab_cd)\n"
    "\terr_final=cost_err(out_dnn2,lab_cd)",
    "out_dnn2",
)

_DATASET = """[dataset{idx}]
data_name = {name}
fea = {fea_block}

lab = {lab_block}

n_chunks = 1
"""

# one stream inside the multi-line `fea` field (reference parse_fea_field
# is line-based, utils.py:1425-1455, so streams are plain-joined with
# continuation indents)
_FEA_STREAM = (
    "fea_name={fea_name}\n"
    "\tfea_lst={scp}\n"
    "\tfea_opts={fea_opts}\n"
    "\tcw_left={cw}\n"
    "\tcw_right={cw}"
)

_MFCC_FEA_OPTS = (
    "apply-cmvn --utt2spk=ark:{u2s} ark:{cmvn} ark:- ark:- | "
    "add-deltas --delta-order=2 ark:- ark:- |"
)

# DIRHA_QLSTM_MFCC.cfg-style streams: cmvn only, no deltas
_MFCC_NODELTA_FEA_OPTS = (
    "apply-cmvn --utt2spk=ark:{u2s} ark:{cmvn} ark:- ark:- | "
    "add-deltas --delta-order=0 ark:- ark:- |"
)

_LAB_BLOCK = """lab_name=lab_cd
\tlab_folder={alidir}
\tlab_opts=ali-to-pdf
\tlab_count_file={counts}
\tlab_data_folder={datadir}
\tlab_graph=none"""

# cd + monophone targets from the same alignment dir, as in the
# best-ensemble recipe (lab_count_file=none for the mono head)
_DUAL_LAB_BLOCK = """lab_name=lab_cd
\tlab_folder={alidir}
\tlab_opts=ali-to-pdf
\tlab_count_file={counts}
\tlab_data_folder={datadir}
\tlab_graph=none
\tlab_name=lab_mono
\tlab_folder={alidir}
\tlab_opts=ali-to-phones --per-frame=true
\tlab_count_file=none
\tlab_data_folder={datadir}
\tlab_graph=none"""

_PROD_LAB_BLOCK = """lab_name=none
\tlab_data_folder={datadir}
\tlab_graph=none"""

_CFG_TEMPLATE = """[cfg_proto]
cfg_proto = proto/global.proto
cfg_proto_chunk = proto/global_chunk.proto

[exp]
cmd =
run_nn_script = {run_nn_script}
out_folder = {out_folder}
seed = {seed}
use_cuda = False
multi_gpu = False
save_gpumem = False
n_epochs_tr = {n_epochs}

{datasets}
[data_use]
train_with = parity_tr
valid_with = parity_dev
forward_with = {forward_with}

[batches]
batch_size_train = {batch_size}
max_seq_length_train = 1000
increase_seq_length_train = False
start_seq_len_train = 100
multply_factor_seq_len_train = 2
batch_size_valid = {batch_size}
max_seq_length_valid = 1000

{arch_sections}
[model]
model_proto = proto/model.proto
model = {model}

[forward]
forward_out = {forward_out}
normalize_posteriors = {normalize_posteriors}
normalize_with_counts_from = {normalize_with_counts}
save_out_file = True
require_decoding = False

[decoding]
decoding_script_folder = kaldi_decoding_scripts/
decoding_script = decode_dnn.sh
decoding_proto = proto/decoding.proto
min_active = 200
max_active = 7000
max_mem = 50000000
beam = 13.0
latbeam = 8.0
acwt = 0.2
max_arcs = -1
skip_scoring = false
scoring_script = local/score.sh
scoring_opts = "--min-lmwt 1 --max-lmwt 10"
norm_vars = False
"""


def write_parity_cfg(
    tree: ParityTree,
    out_folder: str,
    cfg_path: str,
    side: str,
    arch: str = "MLP",
    n_epochs: int = 1,
    batch_size: int = 4,
    cw: int = 2,
    lr: float = 0.08,
    seed: int = 2234,
    production: bool = False,
    run_nn_script: str = "run_nn",
    pretrain: Tuple[str, str] = ("none", "none"),
    opt: str = "sgd",
) -> str:
    """One experiment cfg in the shared INI dialect.  `side` picks the
    model zoo: 'reference' -> torch `neural_networks`, 'tpukaldi' -> flax
    `tpukaldi.models`.  `production=True` adds a label-free forward set
    (posterior emission from pre-seeded final checkpoints).  `pretrain`
    fills arch_pretrain_file per architecture section (common-init
    trajectory comparisons).  `opt` switches every architecture's
    optimizer block: 'sgd' (templates' default) or 'rmsprop' with the
    flagship recipe's hyperparameters (TIMIT_liGRU_fmllr.cfg:
    alpha 0.95, eps 1e-8, centered False)."""
    library = "neural_networks" if side == "reference" else "tpukaldi.models"
    # the reference keeps quaternion nets in their own module
    # (quaternion_neural_networks.py); tpukaldi resolves arch_class in one
    # registry regardless
    qlibrary = (
        "quaternion_neural_networks" if side == "reference"
        else "tpukaldi.models"
    )
    if arch == "MLP":
        template = _MLP_ARCH
    elif arch == "CNN":
        template = _CNN_ARCH
    elif arch == "SincNet":
        template = _SINC_ARCH
    elif arch == "QLSTM":
        template = _QLSTM_ARCH
    elif arch == "best":
        template = _BEST_ARCH
    elif arch == "ae":
        template = _AE_ARCH
    elif arch == "rev":
        template = _REV_ARCH
    elif arch == "fusionRNN":
        template = _FUSION_ARCH
    else:
        prefix, act = RECURRENT_SPECS[arch]
        template = _RECURRENT_ARCH.format(cls=arch, prefix=prefix, act=act)
    pre = tuple(pretrain) + ("none",) * (5 - len(pretrain))
    arch_sections = template.format(
        library=library, qlibrary=qlibrary, n_pdfs=tree.n_pdfs,
        n_mono=tree.n_pdfs // 3 + 1, lr=lr,
        # mfcc stream after add-deltas --delta-order=2 and the cw splice
        spliced_dim=tree.feat_dim * 3 * (2 * cw + 1),
        # a no-delta cw-0 stream keeps the raw ark dim (rev's mse target)
        fea_dim=tree.feat_dim,
        pretrain1=pre[0], pretrain2=pre[1], pretrain3=pre[2],
        pretrain4=pre[3], pretrain5=pre[4],
    )
    if opt == "rmsprop":
        arch_sections = arch_sections.replace(
            "arch_opt = sgd\n"
            "opt_momentum = 0.0\n"
            "opt_weight_decay = 0.0\n"
            "opt_dampening = 0.0\n"
            "opt_nesterov = False",
            "arch_opt = rmsprop\n"
            "opt_momentum = 0.0\n"
            "opt_alpha = 0.95\n"
            "opt_eps = 1e-8\n"
            "opt_centered = False\n"
            "opt_weight_decay = 0.0",
        )
    elif opt != "sgd":
        raise ValueError(f"unsupported parity-cfg optimizer {opt!r}")
    model, forward_out = _MODEL[arch]
    # raw-waveform windows (SincNet) take no feature processing and no
    # context splice, exactly like TIMIT_SincNet_raw.cfg's datasets
    raw = arch == "SincNet"
    if raw:
        cw = 0

    def fea_block(split):
        if arch == "rev":
            # clean + reverberated fbank streams (cmvn only, cw 0/0) as in
            # the TIMIT_rev joint-training recipe; the tree backs both with
            # the same ark (the enhancement target is then exact)
            opts = _MFCC_NODELTA_FEA_OPTS.format(
                u2s=tree.utt2spk(split), cmvn=tree.cmvn(split))
            return "\n\t".join(
                _FEA_STREAM.format(
                    fea_name=name, scp=tree.scp(split), fea_opts=opts, cw=0)
                for name in ("fbankclean", "fbankrev")
            )
        if arch == "best":
            # mfcc (cmvn + delta-order 2) / fbank / fmllr (cmvn only)
            # streams, cw 0/0 — the best-ensemble recipe's exact loader
            # composition, all backed by the tree's feature ark
            streams = []
            for fea_name, tmpl in (("mfcc", _MFCC_FEA_OPTS),
                                   ("fbank", _MFCC_NODELTA_FEA_OPTS),
                                   ("fmllr", _MFCC_NODELTA_FEA_OPTS)):
                streams.append(_FEA_STREAM.format(
                    fea_name=fea_name, scp=tree.scp(split),
                    fea_opts=tmpl.format(
                        u2s=tree.utt2spk(split), cmvn=tree.cmvn(split)),
                    cw=0,
                ))
            return "\n\t".join(streams)
        if arch == "QLSTM":
            # 4 "microphone" mfcc streams (cmvn, no deltas, cw 0/0) as in
            # DIRHA_QLSTM_MFCC.cfg — all backed by the same scp here; the
            # [model] concatenate chain glues them back together
            opts = _MFCC_NODELTA_FEA_OPTS.format(
                u2s=tree.utt2spk(split), cmvn=tree.cmvn(split))
            return "\n\t".join(
                _FEA_STREAM.format(
                    fea_name=f"mfccLA{k}", scp=tree.scp(split),
                    fea_opts=opts, cw=0,
                )
                for k in range(1, 5)
            )
        fea_name = "raw" if raw else "mfcc"
        opts = "" if raw else _MFCC_FEA_OPTS.format(
            u2s=tree.utt2spk(split), cmvn=tree.cmvn(split))
        return _FEA_STREAM.format(
            fea_name=fea_name, scp=tree.scp(split), fea_opts=opts, cw=cw)

    datasets = []
    for idx, (name, split) in enumerate(
        (("parity_tr", "train"), ("parity_dev", "dev"), ("parity_te", "test")),
        start=1,
    ):
        lab_tmpl = (
            _DUAL_LAB_BLOCK if arch in ("best", "rev") else _LAB_BLOCK)
        lab_block = lab_tmpl.format(
            alidir=tree.alidir(split), counts=tree.counts_file,
            datadir=os.path.join(tree.root, "data", split),
        )
        datasets.append(_DATASET.format(
            idx=idx, name=name, fea_block=fea_block(split),
            lab_block=lab_block,
        ))
    forward_with = "parity_te"
    if production:
        datasets.append(_DATASET.format(
            idx=4, name="parity_prod", fea_block=fea_block("test"),
            lab_block=_PROD_LAB_BLOCK.format(
                datadir=os.path.join(tree.root, "data", "test")),
        ))
        forward_with = "parity_prod"
    cfg = _CFG_TEMPLATE.format(
        out_folder=out_folder, seed=seed, n_epochs=n_epochs,
        datasets="\n".join(datasets), forward_with=forward_with,
        batch_size=batch_size, arch_sections=arch_sections, model=model,
        forward_out=forward_out, run_nn_script=run_nn_script,
        # the autoencoder emits the raw bottleneck (no prior normalization,
        # TIMIT_MLP_fbank_autoencoder.cfg [forward]); everything else emits
        # prior-normalized log posteriors
        normalize_posteriors=arch != "ae",
        normalize_with_counts="None" if arch == "ae" else tree.counts_file,
    )
    os.makedirs(os.path.dirname(cfg_path), exist_ok=True)
    with open(cfg_path, "w") as f:
        f.write(cfg)
    return cfg_path


# ---------------------------------------------------------------------------
# running the reference + importing its weights
# ---------------------------------------------------------------------------


def _reference_env(stub_dir: str) -> Dict[str, str]:
    env = dict(os.environ)
    env["PATH"] = stub_dir + os.pathsep + env.get("PATH", "")
    env["MPLBACKEND"] = "Agg"
    env.setdefault("OMP_NUM_THREADS", "2")
    return env


def run_reference_experiment(
    cfg_path: str, stub_dir: str, timeout: int = 900
) -> subprocess.CompletedProcess:
    """Execute the reference's own run_exp.py (torch CPU) with the Kaldi
    stubs on PATH.  cwd is the read-only reference tree so its relative
    proto/ paths resolve; every write goes to the cfg's absolute
    out_folder."""
    return subprocess.run(
        [sys.executable, os.path.join(REFERENCE_DIR, "run_exp.py"), cfg_path],
        cwd=REFERENCE_DIR, env=_reference_env(stub_dir), timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


# Drives ONE chunk through the reference's canonical chunk runtime
# `core.run_nn` (core.py:438-671) — the exact composition the parity
# contract cites: chunk load -> splice -> per-chunk CMVN -> whole-utterance
# batch-1 forward -> out - log(counts/sum) -> write_mat ark.  run_exp.py's
# own CPU forward route cannot be used: it hard-codes the refac01 loader
# (run_exp.py:35) whose labeled-forward path crashes upstream (empty
# lab_dict -> data_set None) and whose non-sequential forward hits an
# UnboundLocalError (core.py:224 max_len_fea).  next_config_file is the
# same chunk (run_nn unconditionally prefetches a next chunk).
_RUN_NN_DRIVER = """import sys
sys.path.insert(0, sys.argv[2])
from core import run_nn
run_nn([], [], [], {}, {}, {}, sys.argv[1], True, sys.argv[1])
"""


def run_reference_forward_chunk(
    chunk_cfg: str, stub_dir: str, timeout: int = 600
) -> subprocess.CompletedProcess:
    """Run the reference's `core.run_nn` on one (forward) chunk cfg."""
    return subprocess.run(
        [sys.executable, "-c", _RUN_NN_DRIVER, chunk_cfg, REFERENCE_DIR],
        cwd=REFERENCE_DIR, env=_reference_env(stub_dir), timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


# (reference section, tpukaldi arch name, model class) per parity cfg;
# the reference keys its final pkls by SECTION (run_exp.py:411-414),
# tpukaldi by arch_name (plan/planner.py final_ckpts)
ARCH_CLASSES = {
    "MLP": (("architecture1", "MLP_layers1", "MLP"),),
    "CNN": (
        ("architecture1", "CNN_layers", "CNN"),
        ("architecture2", "MLP_softmax", "MLP"),
    ),
    "SincNet": (
        ("architecture1", "CNN_layers", "SincNet"),
        ("architecture2", "MLP_softmax", "MLP"),
    ),
    "QLSTM": (
        ("architecture1", "QLSTM", "QLSTM"),
        ("architecture2", "MLP_softmax", "MLP"),
    ),
    "best": (
        ("architecture1", "MLP_layers_first", "MLP"),
        ("architecture2", "liGRU_layers", "liGRU"),
        ("architecture3", "MLP_layers_second", "MLP"),
        ("architecture4", "MLP_layers_last", "MLP"),
        ("architecture5", "MLP_layers_last2", "MLP"),
    ),
    "ae": (
        ("architecture1", "MLP_encoder", "MLP"),
        ("architecture2", "MLP_decoder", "MLP"),
    ),
    "rev": (
        ("architecture1", "liGRU_SE", "liGRU"),
        ("architecture2", "MLP_SE", "MLP"),
        ("architecture3", "liGRU_SR", "liGRU"),
        ("architecture4", "MLP_layers", "MLP"),
        ("architecture5", "MLP_layers2", "MLP"),
    ),
}
for _cls in RECURRENT_SPECS:
    ARCH_CLASSES[_cls] = (
        ("architecture1", f"{_cls}_layers", _cls),
        ("architecture2", "MLP_softmax", "MLP"),
    )
ARCH_CLASSES["fusionRNN"] = (
    ("architecture1", "fusionRNN_layers", "fusionRNN"),
    ("architecture2", "MLP_softmax", "MLP"),
)


def import_final_checkpoints(
    ref_out: str, tpu_out: str, arch: str
) -> Dict[str, str]:
    """Convert the reference run's final_<section>.pkl weights into the
    final_<arch_name>.ckpt files tpukaldi production mode consumes."""
    from .torch_import import convert_checkpoint_file

    os.makedirs(os.path.join(tpu_out, "exp_files"), exist_ok=True)
    out = {}
    for section, arch_name, class_name in ARCH_CLASSES[arch]:
        pkl = os.path.join(ref_out, "exp_files", f"final_{section}.pkl")
        ckpt = os.path.join(tpu_out, "exp_files", f"final_{arch_name}.ckpt")
        convert_checkpoint_file(pkl, ckpt, class_name)
        out[arch_name] = ckpt
    return out


def compare_posterior_arks(
    ark_a: str, ark_b: str
) -> Tuple[float, Dict[str, float]]:
    """Key-matched per-utterance max-abs-diff between two posterior arks
    (utterance order differs between pipelines; keys must not)."""
    from ..io import read_mat_ark

    a = dict(read_mat_ark(ark_a))
    b = dict(read_mat_ark(ark_b))
    if set(a) != set(b):
        raise AssertionError(
            f"utterance sets differ: only-a={sorted(set(a) - set(b))} "
            f"only-b={sorted(set(b) - set(a))}"
        )
    per_utt = {}
    for k in a:
        if a[k].shape != b[k].shape:
            raise AssertionError(
                f"{k}: shape {a[k].shape} vs {b[k].shape}")
        per_utt[k] = float(np.abs(a[k] - b[k]).max())
    return max(per_utt.values()), per_utt


def find_forward_ark(out_folder: str, forward_out: str) -> str:
    ef = os.path.join(out_folder, "exp_files")
    hits = sorted(
        f for f in os.listdir(ef)
        if f.startswith("forward_") and f.endswith(f"_{forward_out}.ark")
    )
    if not hits:
        raise FileNotFoundError(
            f"no forward_*_{forward_out}.ark in {ef}: {sorted(os.listdir(ef))}")
    return os.path.join(ef, hits[-1])


# ---------------------------------------------------------------------------
# one-call drives
# ---------------------------------------------------------------------------


def run_posterior_parity(
    workdir: str, arch: str = "MLP", seed: int = 1234
) -> Tuple[float, Dict[str, float]]:
    """Full measurement: reference train -> reference production forward ->
    weight import -> tpukaldi production forward -> ark diff.  Returns
    (max_abs, per_utt).

    The reference driver run trains + validates; its forward stage is
    expected to crash (run_exp.py's CPU forward route is broken upstream,
    see `run_reference_forward_chunk`).  The forward chunk cfg the driver
    materialized is then executed through the reference's canonical
    `core.run_nn`, producing the posterior ark the contract diffs."""
    import glob

    # SincNet consumes raw 400-sample waveform windows (the recipe's
    # save_raw_fea.py arks, scaled down from 3200 for CPU-side torch);
    # shorter utterances keep the reference's batch-1 conv forward quick
    tree_kw = (
        dict(feat_dim=400, min_len=20, max_len=50)
        if arch == "SincNet" else {}
    )
    tree = build_parity_tree(
        os.path.join(workdir, "tree"), seed=seed, **tree_kw)
    stubs = make_stub_bin_dir(os.path.join(workdir, "bin"))
    ref_out = os.path.join(workdir, "ref_exp")
    forward_out = _MODEL[arch][1]

    train_cfg = write_parity_cfg(
        tree, ref_out, os.path.join(workdir, "ref_train.cfg"), "reference",
        arch=arch,
    )
    proc = run_reference_experiment(train_cfg, stubs)
    final_pkl = os.path.join(
        ref_out, "exp_files", f"final_{ARCH_CLASSES[arch][0][0]}.pkl")
    if not os.path.exists(final_pkl):
        raise RuntimeError(
            f"reference training produced no {final_pkl} (rc="
            f"{proc.returncode}):\n{proc.stdout.decode()[-3000:]}"
        )
    chunk_cfgs = sorted(glob.glob(
        os.path.join(ref_out, "exp_files", "forward_parity_te_*.cfg")))
    assert chunk_cfgs, os.listdir(os.path.join(ref_out, "exp_files"))
    for chunk_cfg in chunk_cfgs:
        proc = run_reference_forward_chunk(chunk_cfg, stubs)
        info = chunk_cfg[:-4] + ".info"
        if not os.path.exists(info):
            raise RuntimeError(
                f"reference run_nn forward failed (rc={proc.returncode}):\n"
                f"{proc.stdout.decode()[-3000:]}"
            )
    ref_ark = find_forward_ark(ref_out, forward_out)

    tpu_out = os.path.join(workdir, "tpu_exp")
    import_final_checkpoints(ref_out, tpu_out, arch)
    tpu_cfg = write_parity_cfg(
        tree, tpu_out, os.path.join(workdir, "tpu.cfg"), "tpukaldi",
        arch=arch, production=True,
    )
    from ..tools.run_exp import run_experiment

    run_experiment(tpu_cfg)
    tpu_ark = find_forward_ark(tpu_out, forward_out)
    return compare_posterior_arks(ref_ark, tpu_ark)


def run_tpu_composition(
    workdir: str, arch: str, seed: int = 1234
) -> Dict[str, "np.ndarray"]:
    """tpukaldi-SIDE-ONLY composition run: build the synthetic parity tree,
    train `arch` for one epoch through the full tpukaldi driver, emit the
    prior-normalized posterior ark for the test split, and return it as a
    {utt: matrix} dict.  Used to regression-lock families the reference
    cannot execute on this host (fusionRNN_jit hard-codes .cuda(),
    reference neural_networks.py:719-996) against recorded goldens."""
    tree = build_parity_tree(os.path.join(workdir, "tree"), seed=seed)
    out = os.path.join(workdir, "tpu_exp")
    cfg = write_parity_cfg(
        tree, out, os.path.join(workdir, "tpu.cfg"), "tpukaldi", arch=arch)
    from ..tools.run_exp import run_experiment

    run_experiment(cfg)
    ark = find_forward_ark(out, _MODEL[arch][1])
    from ..io import kaldi_io as kio

    return {k: m for k, m in kio.read_mat_ark(ark)}


def run_save_raw_fea_parity(
    workdir: str, n_wavs: int = 3, seed: int = 77
) -> Tuple[float, Dict[str, float]]:
    """Run the reference's OWN save_raw_fea.py (its hardcoded path
    constants patched to a synthetic tree — the script ships no CLI,
    reference save_raw_fea.py:22-26) and tpukaldi's
    `tools.save_raw_fea.dump_raw_features` on the same wav files, and diff
    the emitted raw-window arks per utterance.  Returns (max_abs_diff,
    per-utterance dict)."""
    import scipy.io.wavfile

    from ..io import kaldi_io as kio
    from ..tools.save_raw_fea import dump_raw_features

    tree = build_parity_tree(os.path.join(workdir, "tree"), seed=seed)
    stubs = make_stub_bin_dir(os.path.join(workdir, "bin"))

    wav_dir = os.path.join(workdir, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    wav_lst = os.path.join(wav_dir, "wav.lst")
    # reuse the tree's test-split utterance ids so the script's ali pipe
    # (read but unused for windowing) resolves against real alignments
    ids = [k for k, _ in kio.read_mat_scp(tree.scp("test"))][:n_wavs]
    with open(wav_lst, "w") as f:
        for sig_id in ids:
            n = int(rng.integers(8000, 14000))
            pcm = (rng.standard_normal(n) * 8000).astype(np.int16)
            path = os.path.join(wav_dir, f"{sig_id}.wav")
            scipy.io.wavfile.write(path, 16000, pcm)
            f.write(f"{sig_id} {path}\n")

    import re

    ref_out = os.path.join(workdir, "ref_raw")
    src = open(os.path.join(REFERENCE_DIR, "save_raw_fea.py")).read()
    for var, val in (
        ("lab_folder", tree.alidir("test")),
        ("out_folder", ref_out),
        ("wav_lst", wav_lst),
        ("scp_file_out", os.path.join(ref_out, "feats_raw.scp")),
    ):
        # patch only the active (first, uncommented) assignment
        src = re.sub(
            rf'^{var} = ".*"$', f"{var} = {val!r}", src, count=1,
            flags=re.MULTILINE,
        )
    os.makedirs(ref_out, exist_ok=True)
    patched = os.path.join(workdir, "ref_save_raw_fea.py")
    with open(patched, "w") as f:
        f.write(src)
    env = _reference_env(stubs)
    env["PYTHONPATH"] = REFERENCE_DIR + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, patched], cwd=REFERENCE_DIR, env=env, timeout=300,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference save_raw_fea failed:\n{proc.stdout.decode()[-3000:]}")

    tpu_out = os.path.join(workdir, "tpu_raw")
    dump_raw_features(wav_lst, tpu_out)

    per_utt = {}
    for sig_id in ids:
        ref_mat = dict(kio.read_mat_ark(
            os.path.join(ref_out, f"{sig_id}.ark")))[sig_id]
        tpu_mat = dict(kio.read_mat_ark(
            os.path.join(tpu_out, f"{sig_id}.ark")))[sig_id]
        if ref_mat.shape != tpu_mat.shape:
            raise AssertionError(
                f"{sig_id}: shape {ref_mat.shape} vs {tpu_mat.shape}")
        per_utt[sig_id] = float(np.abs(ref_mat - tpu_mat).max())
    return max(per_utt.values()), per_utt


def parse_res_res(path: str) -> List[Dict[str, object]]:
    """Parse epoch rows from a res.res file (both frameworks emit the same
    line shape: `ep=N tr=[...] loss=.. err=.. valid=<set> loss=.. err=..
    lr_<arch>=.. time(s)=..`, reference utils.py:2423-2476)."""
    import re

    rows: List[Dict[str, object]] = []
    for line in open(path):
        line = line.strip()
        if not line.startswith("ep="):
            continue
        losses = re.findall(r"loss=([-\d.eE+]+)", line)
        errs = re.findall(r"err=([-\d.eE+]+)", line)
        lrs = re.findall(r"lr_[^=]+=([^\s]+)", line)
        rows.append({
            "train_loss": float(losses[0]),
            "valid_loss": float(losses[1]),
            "train_err": float(errs[0]),
            "valid_err": float(errs[1]),
            "lrs": tuple(float(v.split(",")[0]) for v in lrs),
        })
    return rows


def run_trajectory_parity(
    workdir: str,
    arch: str = "MLP",
    n_epochs: int = 3,
    seed: int = 1234,
    lr: float = 0.02,
    batch_size: int = 8,
    n_utts=(24, 8, 6),
    noise: float = 1.6,
    opt: str = "sgd",
) -> Tuple[List[Dict[str, object]], List[Dict[str, object]]]:
    """Common-init training-trajectory comparison (VERDICT r2 #4).

    An init-provider reference run produces weights W0 (1 epoch); then the
    REFERENCE trains n_epochs from W0 (its own run_exp loop: seeded
    shuffles, torch SGD, new-bob annealing, reference run_exp.py:374-384)
    and TPUKALDI trains n_epochs from the converted W0 on the same corpus
    and hyperparameters.  Returns (ref_rows, tpu_rows) parsed from the two
    res.res files.  Exact step-level equality is impossible by design (the
    frame-shuffle RNGs differ: reference np.random.shuffle/MT19937 vs
    tpukaldi default_rng/PCG64), so callers assert epoch-level closeness
    and identical annealing decisions, not bit equality.  The default
    regime (lr 0.02, 24 train utts) keeps the valid-loss sequence far from
    the new-bob threshold so the annealing decisions are comparable rather
    than coin flips on a tiny corpus."""
    tree = build_parity_tree(
        os.path.join(workdir, "tree"), seed=seed, n_utts=n_utts, noise=noise)
    stubs = make_stub_bin_dir(os.path.join(workdir, "bin"))

    init_out = os.path.join(workdir, "ref_init")
    # the init run must use the SAME optimizer as the trajectory runs: the
    # reference's pretrain restore loads the optimizer state dict saved in
    # the pkl (core.py optimizer load), and torch's load_state_dict adopts
    # the saved param groups wholesale — an sgd-saved group into rmsprop
    # crashes on the missing 'alpha' hyperparameter
    init_cfg = write_parity_cfg(
        tree, init_out, os.path.join(workdir, "ref_init.cfg"), "reference",
        arch=arch, n_epochs=1, lr=lr, batch_size=batch_size, opt=opt,
    )
    proc = run_reference_experiment(init_cfg, stubs)
    pretrain_pkls = []
    for section, _, _ in ARCH_CLASSES[arch]:
        pkl = os.path.join(init_out, "exp_files", f"final_{section}.pkl")
        if not os.path.exists(pkl):
            raise RuntimeError(
                f"init run produced no {pkl} (rc={proc.returncode}):\n"
                f"{proc.stdout.decode()[-3000:]}")
        pretrain_pkls.append(pkl)
    # templates take up to 5 positional pretrain slots (best/rev)

    ref_out = os.path.join(workdir, "ref_traj")
    ref_cfg = write_parity_cfg(
        tree, ref_out, os.path.join(workdir, "ref_traj.cfg"), "reference",
        arch=arch, n_epochs=n_epochs, pretrain=tuple(pretrain_pkls),
        lr=lr, batch_size=batch_size, opt=opt,
    )
    proc = run_reference_experiment(ref_cfg, stubs)
    ref_res = os.path.join(ref_out, "res.res")
    if not os.path.exists(ref_res):
        raise RuntimeError(
            f"reference trajectory run wrote no res.res (rc="
            f"{proc.returncode}):\n{proc.stdout.decode()[-3000:]}")

    tpu_out = os.path.join(workdir, "tpu_traj")
    os.makedirs(os.path.join(tpu_out, "exp_files"), exist_ok=True)
    from .torch_import import convert_checkpoint_file

    ckpts = []
    for section, arch_name, class_name in ARCH_CLASSES[arch]:
        ckpt = os.path.join(tpu_out, "exp_files", f"init_{arch_name}.ckpt")
        convert_checkpoint_file(
            os.path.join(init_out, "exp_files", f"final_{section}.pkl"),
            ckpt, class_name)
        ckpts.append(ckpt)
    tpu_cfg = write_parity_cfg(
        tree, tpu_out, os.path.join(workdir, "tpu_traj.cfg"), "tpukaldi",
        arch=arch, n_epochs=n_epochs, pretrain=tuple(ckpts),
        lr=lr, batch_size=batch_size, opt=opt,
    )
    from ..tools.run_exp import run_experiment

    run_experiment(tpu_cfg)
    return (parse_res_res(ref_res),
            parse_res_res(os.path.join(tpu_out, "res.res")))


def run_trajectory_variance_control(
    workdir: str,
    arch: str = "liGRU",
    n_epochs: int = 3,
    seed: int = 1234,
    lr: float = 0.002,
    batch_size: int = 8,
    opt: str = "rmsprop",
    exp_seeds: Tuple[int, int] = (2234, 4321),
    n_utts=(24, 8, 6),
    noise: float = 1.6,
):
    """Variance-matched trajectory-parity control (VERDICT r3 weak #6 / #7):
    train the REFERENCE twice from the same common-init W0 with two
    different [exp] shuffle seeds, and tpukaldi once from the converted W0.
    The reference's own seed-to-seed per-epoch loss spread is the measured
    noise floor of the comparison; the cross-framework gap must sit inside
    that bracket for the parity claim to be more than a coarse tolerance.

    Returns (ref_rows_a, ref_rows_b, tpu_rows)."""
    tree = build_parity_tree(
        os.path.join(workdir, "tree"), seed=seed, n_utts=n_utts, noise=noise)
    stubs = make_stub_bin_dir(os.path.join(workdir, "bin"))

    init_out = os.path.join(workdir, "ref_init")
    init_cfg = write_parity_cfg(
        tree, init_out, os.path.join(workdir, "ref_init.cfg"), "reference",
        arch=arch, n_epochs=1, lr=lr, batch_size=batch_size, opt=opt,
    )
    proc = run_reference_experiment(init_cfg, stubs)
    pretrain_pkls = []
    for section, _, _ in ARCH_CLASSES[arch]:
        pkl = os.path.join(init_out, "exp_files", f"final_{section}.pkl")
        if not os.path.exists(pkl):
            raise RuntimeError(
                f"init run produced no {pkl} (rc={proc.returncode}):\n"
                f"{proc.stdout.decode()[-3000:]}")
        pretrain_pkls.append(pkl)

    ref_rows = []
    for tag, exp_seed in zip(("a", "b"), exp_seeds):
        ref_out = os.path.join(workdir, f"ref_traj_{tag}")
        ref_cfg = write_parity_cfg(
            tree, ref_out, os.path.join(workdir, f"ref_traj_{tag}.cfg"),
            "reference", arch=arch, n_epochs=n_epochs,
            pretrain=tuple(pretrain_pkls), lr=lr, batch_size=batch_size,
            opt=opt, seed=exp_seed,
        )
        proc = run_reference_experiment(ref_cfg, stubs)
        res = os.path.join(ref_out, "res.res")
        if not os.path.exists(res):
            raise RuntimeError(
                f"reference control run {tag} wrote no res.res (rc="
                f"{proc.returncode}):\n{proc.stdout.decode()[-3000:]}")
        ref_rows.append(parse_res_res(res))

    tpu_out = os.path.join(workdir, "tpu_traj")
    os.makedirs(os.path.join(tpu_out, "exp_files"), exist_ok=True)
    from .torch_import import convert_checkpoint_file

    ckpts = []
    for section, arch_name, class_name in ARCH_CLASSES[arch]:
        ckpt = os.path.join(tpu_out, "exp_files", f"init_{arch_name}.ckpt")
        convert_checkpoint_file(
            os.path.join(init_out, "exp_files", f"final_{section}.pkl"),
            ckpt, class_name)
        ckpts.append(ckpt)
    tpu_cfg = write_parity_cfg(
        tree, tpu_out, os.path.join(workdir, "tpu_traj.cfg"), "tpukaldi",
        arch=arch, n_epochs=n_epochs, pretrain=tuple(ckpts),
        lr=lr, batch_size=batch_size, opt=opt, seed=exp_seeds[0],
    )
    from ..tools.run_exp import run_experiment

    run_experiment(tpu_cfg)
    return (ref_rows[0], ref_rows[1],
            parse_res_res(os.path.join(tpu_out, "res.res")))


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("workdir")
    ap.add_argument("--arch", default="MLP", choices=sorted(_MODEL))
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--trajectory", action="store_true",
                    help="run the training-trajectory comparison instead")
    args = ap.parse_args(argv)
    if args.trajectory:
        ref_rows, tpu_rows = run_trajectory_parity(
            args.workdir, arch=args.arch, seed=args.seed)
        for tag, rows in (("ref", ref_rows), ("tpu", tpu_rows)):
            for i, r in enumerate(rows):
                print(f"{tag} ep={i} {r}")
        return 0
    max_abs, per_utt = run_posterior_parity(
        args.workdir, arch=args.arch, seed=args.seed)
    for k in sorted(per_utt):
        print(f"{k} {per_utt[k]:.3e}")
    print(f"max_abs_diff {max_abs:.3e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
