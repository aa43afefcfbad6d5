"""Multi-feature-stream experiment: two feature streams with different
context windows consumed by one model via the DSL `concatenate` op — the
reference's best-PER configuration pattern
(cfg/TIMIT_baselines/TIMIT_mfcc_fbank_fmllr_liGRU_best.cfg)."""

import os
import re

import numpy as np
import pytest

from tpukaldi.data import load_chunk
from tpukaldi.data.synth import generate_corpus, write_cfg
from tpukaldi.io import ArkScpWriter, read_mat_scp
from tpukaldi.tools.run_exp import run_experiment
from tpukaldi.config import load_config


@pytest.fixture(scope="module")
def corpus2(tmp_path_factory):
    """Synth corpus plus a second derived feature stream ('fbank' = squared
    features, same keys) per split."""
    root = tmp_path_factory.mktemp("mf")
    corpus = generate_corpus(str(root / "c"), n_utts=8, seed=4, noise=0.4)
    for split, scp in corpus.feats_scp.items():
        d = os.path.dirname(scp)
        with ArkScpWriter(
            os.path.join(d, "feats2.ark"), os.path.join(d, "feats2.scp")
        ) as w:
            for key, mat in read_mat_scp(scp):
                w.write(key, np.tanh(mat).astype(np.float32))
    return corpus


def _two_stream_cfg(corpus, out):
    cfg = write_cfg(corpus, out, arch="MLP", hidden=32, n_epochs=2,
                    n_chunks=1, batch_size=64, lr=0.3, cw=2)
    text = open(cfg).read()
    # second stream with a different context window in every dataset
    for split in ("train", "dev", "test"):
        d = os.path.dirname(corpus.feats_scp[split])
        old = (
            f"fea = fea_name=mfcc\n"
            f"\tfea_lst={d}/feats.scp\n"
            f"\tfea_opts=copy-feats ark:- ark:- |\n"
            f"\tcw_left=2\n"
            f"\tcw_right=2\n"
        )
        new = old + (
            f"\tfea_name=fbank\n"
            f"\tfea_lst={d}/feats2.scp\n"
            f"\tfea_opts=copy-feats ark:- ark:- |\n"
            f"\tcw_left=1\n"
            f"\tcw_right=1\n"
        )
        assert old in text
        text = text.replace(old, new, 1)
    text = text.replace(
        "model = out_dnn1=compute(MLP_layers1,mfcc)",
        "model = fea_all=concatenate(mfcc,fbank)\n"
        "\tout_dnn1=compute(MLP_layers1,fea_all)",
    )
    path = os.path.join(out, "two_stream.cfg")
    open(path, "w").write(text)
    return path


def test_multi_stream_chunk(corpus2):
    exp = load_config(_two_stream_cfg(corpus2, corpus2.root))
    ds = exp.datasets["synth_tr"]
    assert list(ds.features) == ["mfcc", "fbank"]
    chunk = load_chunk(ds, ["mfcc", "fbank"], ["lab_cd"], 1000)
    # mfcc spliced cw2/2 -> 65 cols; fbank cw1/1 -> 39 cols
    assert chunk.fea_layout == {"mfcc": (0, 65), "fbank": (65, 104)}
    assert chunk.feats.shape[1] == 104
    # cw_max compensation: both streams aligned to the same sentence rows
    assert chunk.end_index[-1] == chunk.n_frames


def test_multi_stream_experiment(corpus2, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mf_exp"))
    cfg = _two_stream_cfg(corpus2, out)
    run_experiment(cfg)
    lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
    losses = [float(re.search(r"valid=\S+ loss=(\d+\.\d+)", l).group(1))
              for l in lines]
    assert losses[-1] < losses[0]
    ef = os.path.join(out, "exp_files")
    arks = [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")]
    assert arks
