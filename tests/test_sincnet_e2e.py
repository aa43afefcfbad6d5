"""SincNet raw-waveform experiment through the full driver: wav fixtures ->
save_raw_fea windows -> SincNet+MLP training -> posterior arks (the
TIMIT_SincNet_raw.cfg path, reference README raw-wave tutorial)."""

import os
import re
import struct

import numpy as np
import pytest

from tpukaldi.data.synth import SynthCorpus, write_cfg
from tpukaldi.io import read_mat_ark, save_counts, write_vec_int
from tpukaldi.tools.run_exp import run_experiment
from tpukaldi.tools.save_raw_fea import dump_raw_features

FS, SHIFT, WIN = 16000, 160, 400
N_CLASSES = 4


def _write_wav(path, samples):
    data = (np.clip(samples, -1, 1) * 30000).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, FS, FS * 2, 2, 16)
    riff = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    riff += b"fmt " + struct.pack("<I", 16) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    with open(path, "wb") as f:
        f.write(riff)


@pytest.fixture(scope="module")
def raw_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("sincraw")
    rng = np.random.default_rng(3)
    counts = np.zeros(N_CLASSES)
    splits = {"train": 10, "dev": 4, "test": 4}
    feats_scp, lab_folder = {}, {}
    for split, n in splits.items():
        d = root / split
        d.mkdir()
        wav_lst = d / "wav.lst"
        with open(wav_lst, "w") as wl, open(d / "labels.ark", "wb") as labf:
            for i in range(n):
                n_lab = int(rng.integers(40, 70))
                n_samp = n_lab * SHIFT + WIN  # a bit over; windows trim
                labels = rng.integers(0, N_CLASSES, n_lab * 2)
                t = np.arange(n_samp) / FS
                freq = 300.0 + 700.0 * labels[np.arange(n_samp) // SHIFT]
                sig = np.sin(2 * np.pi * freq * t)
                sig += 0.05 * rng.standard_normal(n_samp)
                key = f"{split}_utt{i:02d}"
                wav = d / f"{key}.wav"
                _write_wav(str(wav), sig)
                wl.write(f"{key} {wav}\n")
                # frame count must match save_raw_fea's windowing loop
                n_frames = 0
                beg = 0
                while beg + WIN < n_samp:
                    n_frames += 1
                    beg += SHIFT
                frame_labels = labels[:n_frames]
                write_vec_int(labf, frame_labels, key=key)
                if split == "train":
                    counts += np.bincount(frame_labels, minlength=N_CLASSES)
        scp = dump_raw_features(str(wav_lst), str(d / "raw"))
        feats_scp[split] = scp
        lab_folder[split] = str(d)
    counts_file = str(root / "counts")
    save_counts(np.maximum(counts, 1.0), counts_file)
    return SynthCorpus(
        root=str(root),
        feats_scp=feats_scp,
        lab_folder=lab_folder,
        counts_file=counts_file,
        n_classes=N_CLASSES,
        feat_dim=3200,
    )


def test_sincnet_raw_experiment(raw_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sinc_exp"))
    cfg = write_cfg(raw_corpus, out, arch="SincNet", n_epochs=2, n_chunks=1,
                    batch_size=32, lr=0.05, cw=0)
    # N_out substitution: lab_nout explicit (no final.mdl in synth dirs)
    text = open(cfg).read().replace(
        "lab_opts=ali-to-pdf", "lab_opts=ali-to-pdf\n\tlab_nout=4"
    )
    open(cfg, "w").write(text)
    run_experiment(cfg)
    lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
    assert len(lines) == 2
    errs = [float(re.search(r"valid=\S+ loss=\S+ err=(\d+\.\d+)", l).group(1))
            for l in lines]
    assert errs[-1] < 0.75  # 4-class task: learning beats chance
    ef = os.path.join(out, "exp_files")
    arks = [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")]
    posts = dict(read_mat_ark(os.path.join(ef, arks[0])))
    assert all(m.shape[1] == 4 and np.isfinite(m).all()
               for m in posts.values())
