"""Forward-stage packing + pipelining: the on-device gather of real frames
(TPUKALDI_FORWARD_PACK) must leave the emitted posterior arks BYTE-identical
to the padded path — it only changes which bytes cross the link.  The CM2
codec knob must round-trip through the compressed-matrix reader within its
quantization bound."""

import glob
import os

import numpy as np

from tpukaldi.data.synth import generate_corpus, load_corpus, write_cfg
from tpukaldi.io import kaldi_io as kio
from tpukaldi.tools.run_exp import run_experiment


def _run(tmp_path, sub, env):
    out = str(tmp_path / sub)
    cfg = write_cfg(_run.corpus, out, arch="MLP", n_epochs=1, n_chunks=1,
                    batch_size=16, cw=2, lr=0.05)
    prev = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        run_experiment(cfg)
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    arks = sorted(glob.glob(os.path.join(out, "exp_files", "forward_*.ark")))
    assert arks, "no posterior arks emitted"
    return arks


def _read_all(ark):
    return dict(kio.read_mat_ark(ark))


def test_packed_forward_arks_byte_identical(tmp_path):
    corp = str(tmp_path / "corpus")
    generate_corpus(corp, n_utts=14, feat_dim=10, n_classes=12,
                    min_len=30, max_len=90, seed=4)
    _run.corpus = load_corpus(corp)
    packed = _run(tmp_path, "packed", {"TPUKALDI_FORWARD_PACK": "1"})
    padded = _run(tmp_path, "padded", {"TPUKALDI_FORWARD_PACK": "0"})
    assert len(packed) == len(padded)
    for a, b in zip(packed, padded):
        assert open(a, "rb").read() == open(b, "rb").read(), (a, b)


def test_cm2_codec_roundtrips_within_quantization(tmp_path):
    corp = str(tmp_path / "corpus")
    generate_corpus(corp, n_utts=10, feat_dim=10, n_classes=12,
                    min_len=30, max_len=70, seed=6)
    _run.corpus = load_corpus(corp)
    exact = _run(tmp_path, "fm", {"TPUKALDI_FORWARD_ARK_CODEC": "fm"})
    comp = _run(tmp_path, "cm2", {"TPUKALDI_FORWARD_ARK_CODEC": "cm2"})
    for a, b in zip(exact, comp):
        assert os.path.getsize(b) < 0.6 * os.path.getsize(a)
        ma, mb = _read_all(a), _read_all(b)
        assert set(ma) == set(mb)
        for k in ma:
            rng = ma[k].max() - ma[k].min()
            err = np.abs(ma[k] - mb[k]).max()
            assert err <= rng / 65535 * 2 + 1e-6, (k, err, rng)
