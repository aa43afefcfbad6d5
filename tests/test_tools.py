"""Tools tests: raw-feature dumper, hyperparameter tuner, metrics
export/plots, model diagram."""

import os
import struct

import numpy as np

from tpukaldi.tools.metrics import create_curves, export_txt, parse_res
from tpukaldi.tools.save_raw_fea import dump_raw_features, window_signal
from tpukaldi.tools.tune_hyperparameters import generate_tuning_cfgs


def test_window_signal_alignment():
    fs = 16000
    sig = np.arange(fs, dtype=np.float64)  # 1 s ramp
    frames = window_signal(sig, 3200, 400, 160)
    # same frame count as a 25ms/10ms label windowing
    assert frames.shape[1] == 3200
    expected_frames = 0
    beg = 0
    while beg + 400 < fs:
        expected_frames += 1
        beg += 160
    assert frames.shape[0] == expected_frames
    # interior frames are exact signal slices centered on the label window
    mid = frames.shape[0] // 2
    center = int(mid * 160 + 400 / 2) - 1
    np.testing.assert_array_equal(frames[mid], sig[center - 1600 : center + 1600])
    # edge frames are zero-padded
    assert frames[0][0] == 0.0


def test_dump_raw_features(tmp_path):
    # RIFF wav fixture
    fs = 16000
    samples = (np.sin(np.linspace(0, 100, fs // 2)) * 20000).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, fs, fs * 2, 2, 16)
    riff = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    riff += b"fmt " + struct.pack("<I", 16) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    wav = tmp_path / "utt1.wav"
    wav.write_bytes(riff)
    lst = tmp_path / "wav.lst"
    lst.write_text(f"utt1 {wav}\n")
    scp = dump_raw_features(str(lst), str(tmp_path / "raw"))
    from tpukaldi.io import read_mat_scp

    mats = dict(read_mat_scp(scp))
    assert "utt1" in mats
    assert mats["utt1"].shape[1] == 3200
    assert np.abs(mats["utt1"]).max() <= 1.0


def test_tuner(tmp_path):
    base = tmp_path / "base.cfg"
    base.write_text(
        "[exp]\nout_folder = /old\narch_lr = 0.1\nbatch_size_train = 64\n"
        "dnn_act = relu,softmax\n"
    )
    cfgs = generate_tuning_cfgs(
        str(base), str(tmp_path / "tune"), 5,
        ["arch_lr=randfloat(0.001,0.01)",
         "batch_size_train=randint(32,256)",
         "dnn_act=choose_str{relu,softmax|tanh,softmax}"],
    )
    assert len(cfgs) == 5
    lrs = set()
    for i, path in enumerate(cfgs):
        text = open(path).read()
        assert f"out_folder = {tmp_path}/tune/exp{i}" in text
        lr = float(
            [l for l in text.splitlines() if l.startswith("arch_lr")][0]
            .split("=")[1]
        )
        assert 0.001 <= lr <= 0.01
        lrs.add(lr)
        bs = int(
            [l for l in text.splitlines() if l.startswith("batch_size")][0]
            .split("=")[1]
        )
        assert 32 <= bs <= 256
        act = [l for l in text.splitlines() if l.startswith("dnn_act")][0]
        assert act.split("=")[1].strip() in ("relu,softmax", "tanh,softmax")
    assert len(lrs) > 1  # actually randomized


def test_metrics_parse_and_export(tmp_path):
    res = tmp_path / "res.res"
    res.write_text(
        "ep=0 tr=['tr'] loss=2.100 err=0.747 valid=dev loss=2.025 err=0.538 "
        "lr_a=0.15 time(s)=16\n"
        "ep=1 tr=['tr'] loss=1.636 err=0.453 valid=dev loss=1.695 err=0.308 "
        "lr_a=0.075 time(s)=12\n"
        "%WER 23.2 [x] -> y\n"
    )
    data = parse_res(str(res))
    assert data["train_loss"] == [2.1, 1.636]
    assert data["valid"]["dev"]["err"] == [0.538, 0.308]
    assert data["lr"]["a"] == [0.15, 0.075]
    assert data["time"] == [16, 12]
    assert data["wer"] == [23.2]
    files = export_txt(str(res), str(tmp_path))
    assert any(f.endswith("train_loss.txt") for f in files)
    accs = open(tmp_path / "valid_dev_acc.txt").read().split()
    assert float(accs[1]) > float(accs[0])
    pngs = create_curves(str(res), str(tmp_path))
    for p in pngs:
        assert os.path.getsize(p) > 0


def test_diagram(tmp_path):
    from tpukaldi.config.model_dsl import parse_model
    from tpukaldi.tools.diagram import render_svg

    stmts = parse_model(
        "out1=compute(arch1,mfcc)\nout2=compute(arch2,out1)\n"
        "loss_final=cost_nll(out2,lab_cd)\nerr_final=cost_err(out2,lab_cd)"
    )
    svg = render_svg(stmts, ["mfcc"], ["lab_cd"])
    assert svg.startswith("<svg")
    assert "out2" in svg and "mfcc" in svg and "</svg>" in svg
