"""Long-tail behavior tests: production (no-label transcription) mode,
autoencoder (mse) configs, multi-label joint-loss models, multi-feature
streams, and the sequence-length curriculum."""

import os
import re

import numpy as np
import pytest

from tpukaldi.config import load_config
from tpukaldi.data import load_chunk
from tpukaldi.data.synth import generate_corpus, write_cfg
from tpukaldi.io import read_mat_ark, save_counts, write_vec_int
from tpukaldi.tools.run_exp import run_experiment


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("lt")
    return generate_corpus(str(root / "corpus"), n_utts=8, seed=9, noise=0.4)


def _add_mono_labels(corpus, n_mono=5):
    """Second label stream: mono = cd % n_mono, pre-dumped per split."""
    from tpukaldi.io import read_vec_int_ark

    for split, folder in corpus.lab_folder.items():
        cd = dict(read_vec_int_ark(os.path.join(folder, "labels.ark")))
        mono_dir = os.path.join(folder, "mono")
        os.makedirs(mono_dir, exist_ok=True)
        with open(os.path.join(mono_dir, "labels.ark"), "wb") as f:
            for k, v in cd.items():
                write_vec_int(f, v % n_mono, key=k)
    counts = os.path.join(corpus.root, "mono_counts")
    save_counts(np.ones(n_mono), counts)
    return counts


def test_production_mode(corpus, tmp_path_factory):
    """Train normally, then transcribe with a lab_name=none cfg reusing the
    final checkpoints (reference run_exp.py:168-174, utils.py:535-555)."""
    out = str(tmp_path_factory.mktemp("prod"))
    cfg = write_cfg(corpus, out, arch="MLP", n_epochs=1, n_chunks=1,
                    batch_size=64, lr=0.3)
    run_experiment(cfg)
    assert os.path.exists(os.path.join(out, "exp_files/final_MLP_layers1.ckpt"))

    # production cfg: same out_folder, forward dataset without labels
    text = open(cfg).read()
    prod_text = re.sub(
        r"lab = lab_name=lab_cd\n(\tlab_\w+=.*\n)+\nn_chunks = 1\n\n"
        r"\[data_use\]",
        "lab = lab_name=none\n\nn_chunks = 1\n\n[data_use]",
        text,
        count=1,
        flags=0,
    )
    # the regex above must only strip dataset3's labels (the forward set);
    # apply to the last dataset block
    assert "lab_name=none" in prod_text, "cfg rewrite failed"
    prod_cfg = os.path.join(out, "prod.cfg")
    with open(prod_cfg, "w") as f:
        f.write(prod_text)
    # remove forward ledger so the production run redoes it
    ef = os.path.join(out, "exp_files")
    for fn in os.listdir(ef):
        if fn.startswith("forward_"):
            os.remove(os.path.join(ef, fn))
    exp = run_experiment(prod_cfg)
    assert exp.production
    arks = [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")]
    assert arks
    posts = dict(read_mat_ark(os.path.join(ef, arks[0])))
    assert all(m.shape[1] == 10 for m in posts.values())


AUTOENC_SECTIONS = """
[architecture2]
arch_name = MLP_decoder
arch_proto = proto/MLP.proto
arch_library = tpukaldi.models
arch_class = MLP
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = False
dnn_lay = 65
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
"""


def test_autoencoder(corpus, tmp_path_factory):
    """MSE reconstruction objective (TIMIT_MLP_fbank_autoencoder.cfg
    pattern): loss=mse(dec_out, fea), forward_out=enc_out bottleneck."""
    out = str(tmp_path_factory.mktemp("ae"))
    cfg = write_cfg(corpus, out, arch="MLP", hidden=24, n_epochs=4,
                    n_chunks=1, batch_size=64, lr=1.0)
    text = open(cfg).read()
    text = text.replace("dnn_lay = 24,N_out_lab_cd", "dnn_lay = 24")
    text = text.replace("dnn_drop = 0.1,0.0", "dnn_drop = 0.0")
    text = text.replace("dnn_use_batchnorm = True,False", "dnn_use_batchnorm = False")
    text = text.replace("dnn_use_laynorm = False,False", "dnn_use_laynorm = False")
    text = text.replace("dnn_act = relu,softmax", "dnn_act = relu")
    text = text.replace("arch_name = MLP_layers1", "arch_name = MLP_encoder")
    text = text.replace(
        "[model]",
        AUTOENC_SECTIONS.format(lr=1.0) + "\n[model]",
    )
    text = text.replace(
        "model = out_dnn1=compute(MLP_layers1,mfcc)\n"
        "\tloss_final=cost_nll(out_dnn1,lab_cd)\n"
        "\terr_final=cost_err(out_dnn1,lab_cd)",
        "model = enc_out=compute(MLP_encoder,mfcc)\n"
        "\tdec_out=compute(MLP_decoder,enc_out)\n"
        "\tloss_final=mse(dec_out,mfcc)\n"
        "\terr_final=cost_err(dec_out,lab_cd)",
    )
    text = text.replace("forward_out = out_dnn1", "forward_out = enc_out")
    text = text.replace("normalize_posteriors = True", "normalize_posteriors = False")
    ae_cfg = os.path.join(out, "ae.cfg")
    open(ae_cfg, "w").write(text)
    run_experiment(ae_cfg)
    lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
    losses = [float(re.search(r"loss=(\d+\.\d+)", l).group(1)) for l in lines]
    assert losses[-1] < losses[0]  # reconstruction improves
    ef = os.path.join(out, "exp_files")
    ark = [f for f in os.listdir(ef) if f.endswith("enc_out_to_decode.ark")]
    posts = dict(read_mat_ark(os.path.join(ef, ark[0])))
    assert all(m.shape[1] == 24 for m in posts.values())  # bottleneck dim


def test_joint_loss_two_labels(corpus, tmp_path_factory):
    """The flagship DSL shape: two heads, cost_nll each, weighted sum
    (TIMIT_liGRU_fmllr.cfg model section)."""
    mono_counts = _add_mono_labels(corpus)
    out = str(tmp_path_factory.mktemp("joint"))
    cfg = write_cfg(corpus, out, arch="MLP", hidden=32, n_epochs=2,
                    n_chunks=1, batch_size=64, lr=0.2)
    text = open(cfg).read()
    # add the mono label stream to every dataset
    text = text.replace(
        "lab = lab_name=lab_cd",
        "lab = lab_name=lab_cd",
    )
    for split, ds in (("train", "dataset1"), ("dev", "dataset2"),
                      ("test", "dataset3")):
        lab_dir = corpus.lab_folder[split]
        old = (
            f"\tlab_count_file={corpus.counts_file}\n"
            f"\tlab_data_folder={lab_dir}\n"
            f"\tlab_graph=none\n"
        )
        new = old + (
            f"\tlab_name=lab_mono\n"
            f"\tlab_folder={lab_dir}/mono\n"
            f"\tlab_opts=ali-to-phones --per-frame=true\n"
            f"\tlab_count_file={mono_counts}\n"
            f"\tlab_data_folder={lab_dir}\n"
            f"\tlab_graph=none\n"
        )
        text = text.replace(old, new, 1)
    # second head + joint loss
    text = text.replace("dnn_lay = 32,N_out_lab_cd", "dnn_lay = 32")
    text = text.replace("dnn_drop = 0.1,0.0", "dnn_drop = 0.0")
    text = text.replace("dnn_use_batchnorm = True,False", "dnn_use_batchnorm = True")
    text = text.replace("dnn_use_laynorm = False,False", "dnn_use_laynorm = False")
    text = text.replace("dnn_act = relu,softmax", "dnn_act = relu")
    text = text.replace("arch_name = MLP_layers1", "arch_name = MLP_trunk")
    heads = ""
    for i, (name, lay) in enumerate(
        (("MLP_cd", "N_out_lab_cd"), ("MLP_mono", "N_out_lab_mono")), start=2
    ):
        heads += AUTOENC_SECTIONS.format(lr=0.2).replace(
            "architecture2", f"architecture{i}"
        ).replace("MLP_decoder", name).replace("dnn_lay = 65", f"dnn_lay = {lay}"
        ).replace("dnn_act = linear", "dnn_act = softmax")
    text = text.replace("[model]", heads + "\n[model]")
    text = text.replace(
        "model = out_dnn1=compute(MLP_layers1,mfcc)\n"
        "\tloss_final=cost_nll(out_dnn1,lab_cd)\n"
        "\terr_final=cost_err(out_dnn1,lab_cd)",
        "model = trunk=compute(MLP_trunk,mfcc)\n"
        "\tout_cd=compute(MLP_cd,trunk)\n"
        "\tout_mono=compute(MLP_mono,trunk)\n"
        "\tloss_mono=cost_nll(out_mono,lab_mono)\n"
        "\tloss_mono_w=mult_constant(loss_mono,0.5)\n"
        "\tloss_cd=cost_nll(out_cd,lab_cd)\n"
        "\tloss_final=sum(loss_cd,loss_mono_w)\n"
        "\terr_final=cost_err(out_cd,lab_cd)",
    )
    text = text.replace("forward_out = out_dnn1", "forward_out = out_cd")
    joint_cfg = os.path.join(out, "joint.cfg")
    open(joint_cfg, "w").write(text)
    exp = run_experiment(joint_cfg)
    # mono label stream resolved: N_out_lab_mono = 5
    assert exp.archs["MLP_mono"].options["dnn_lay"] == "5"
    lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
    errs = [float(re.search(r"err=(\d+\.\d+)", l).group(1)) for l in lines]
    assert errs[-1] <= errs[0]


def test_multi_label_chunk_loading(corpus):
    _add_mono_labels(corpus)
    import dataclasses

    from tpukaldi.config.cfg import DatasetSpec, FeatureSpec, LabelSpec

    ds = DatasetSpec(
        name="x",
        section="dataset1",
        features={
            "mfcc": FeatureSpec("mfcc", corpus.feats_scp["train"], "", 1, 1)
        },
        labels={
            "lab_cd": LabelSpec("lab_cd", corpus.lab_folder["train"], ""),
            "lab_mono": LabelSpec(
                "lab_mono", corpus.lab_folder["train"] + "/mono", ""
            ),
        },
        n_chunks=1,
    )
    chunk = load_chunk(ds, ["mfcc"], ["lab_cd", "lab_mono"], 1000)
    assert chunk.labs.shape[1] == 2
    assert chunk.lab_layout == {"lab_cd": 0, "lab_mono": 1}
    # mono consistent with cd
    np.testing.assert_array_equal(chunk.labs[:, 1], chunk.labs[:, 0] % 5)


def test_seq_length_curriculum(corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curr"))
    cfg = write_cfg(corpus, out, arch="MLP", n_epochs=3, n_chunks=1)
    exp = load_config(cfg)
    exp.batches.increase_seq_length_train = True
    exp.batches.start_seq_len_train = 100
    exp.batches.multply_factor_seq_len_train = 2
    assert exp.batches.seq_length_for_epoch(0) == 100
    assert exp.batches.seq_length_for_epoch(1) == 200
    assert exp.batches.seq_length_for_epoch(2) == 400
    # capped at max
    exp.batches.max_seq_length_train = [300, 300, 300]
    assert exp.batches.seq_length_for_epoch(2) == 300
