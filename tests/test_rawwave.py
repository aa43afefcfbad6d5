"""Raw-waveform path with different feature/label time rates: samples in,
10ms-frame labels out, through chunk loading, rate-aware batching, and the
logMelFb front-end in the compiled graph."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpukaldi.config.cfg import DatasetSpec, FeatureSpec, LabelSpec
from tpukaldi.data import iter_forward_utterances, iter_seq_batches, load_chunk
from tpukaldi.io import ArkScpWriter, write_vec_int

SHIFT, WIN = 160, 400  # 10 ms / 25 ms at 16 kHz
MSL = [32000, 32000, 199, 199, SHIFT, WIN]  # size_fea,step,size_lab,step,shift,window


@pytest.fixture(scope="module")
def raw_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw")
    rng = np.random.default_rng(0)
    with ArkScpWriter(
        str(root / "feats.ark"), str(root / "feats.scp")
    ) as w, open(root / "labels.ark", "wb") as labf:
        for i in range(6):
            n_lab = int(rng.integers(40, 120))
            n_samp = (n_lab - 1) * SHIFT + WIN
            # class-dependent tone so the task is learnable
            labels = rng.integers(0, 4, n_lab)
            t = np.arange(n_samp) / 16000.0
            freq = 200.0 + 400.0 * labels[np.minimum(
                (np.arange(n_samp) // SHIFT), n_lab - 1)]
            sig = np.sin(2 * np.pi * freq * t)[:, None]
            w.write(f"utt{i}", sig.astype(np.float32))
            write_vec_int(labf, labels, key=f"utt{i}")
    return root


def _dataset(root):
    return DatasetSpec(
        name="raw",
        section="dataset1",
        features={"wave": FeatureSpec("wave", str(root / "feats.scp"), "", 0, 0)},
        labels={"lab_cd": LabelSpec("lab_cd", str(root / "labels.ark"), "")},
        n_chunks=1,
    )


def test_rate_aware_chunk(raw_corpus):
    chunk = load_chunk(_dataset(raw_corpus), ["wave"], ["lab_cd"], MSL)
    assert chunk.rates_differ
    assert chunk.window_shift == SHIFT and chunk.window_size == WIN
    # per sentence: n_samp == (n_lab-1)*shift + window
    np.testing.assert_array_equal(
        chunk.sentence_lengths,
        (chunk.lab_sentence_lengths - 1) * SHIFT + WIN,
    )


def test_rate_aware_batches(raw_corpus):
    chunk = load_chunk(_dataset(raw_corpus), ["wave"], ["lab_cd"], MSL)
    batches = list(iter_seq_batches(chunk, 2, rng=np.random.default_rng(0)))
    assert batches
    for b in batches:
        T_fea, T_lab = b.feats.shape[0], b.labs.shape[0]
        assert T_fea == (T_lab - 1) * SHIFT + WIN
    utts = list(iter_forward_utterances(chunk))
    assert all(
        u.feats.shape[0] == (u.labs.shape[0] - 1) * SHIFT + WIN for u in utts
    )


def test_logmelfb_graph_end_to_end(raw_corpus):
    """logMelFb front-end + MLP head on rate-differing batches: the mel
    frame axis aligns with the label axis, NLL computes, training steps."""
    import optax

    from tpukaldi.models import MLP, logMelFb

    chunk = load_chunk(_dataset(raw_corpus), ["wave"], ["lab_cd"], MSL)
    batch = next(iter_seq_batches(chunk, 2, rng=None))
    x = jnp.asarray(batch.feats)
    y = jnp.asarray(batch.labs[..., 0].reshape(-1))

    mel = logMelFb(
        options={
            "logmelfb_nr_filt": "20",
            "logmelfb_stft_window_size": str(WIN),
            "logmelfb_stft_window_shift": str(SHIFT),
        },
        inp_dim=1,
    )
    vmel = mel.init({"params": jax.random.key(0)}, x)  # param-free front-end
    frames = mel.apply(vmel, x)
    # mel frames == label frames
    assert frames.shape[0] == batch.labs.shape[0]
    head = MLP(
        options={
            "dnn_lay": "32,4", "dnn_drop": "0.0,0.0",
            "dnn_use_laynorm_inp": "False", "dnn_use_batchnorm_inp": "False",
            "dnn_use_batchnorm": "False,False", "dnn_use_laynorm": "False,False",
            "dnn_act": "relu,softmax",
        },
        inp_dim=20,
    )
    hf = frames.reshape(-1, 20)
    vh = head.init({"params": jax.random.key(1)}, hf)
    params = {"head": vh["params"]}
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            fr = mel.apply(vmel, x)
            lp = head.apply({"params": p["head"]}, fr.reshape(-1, 20))
            nll = -jnp.take_along_axis(lp, y[:, None], axis=1).mean()
            err = (lp.argmax(-1) != y).mean()
            return nll, err

        (l, e), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, l, e

    errs = []
    for _ in range(40):
        params, opt, loss, err = step(params, opt, x, y)
        errs.append(float(err))
    assert errs[-1] < errs[0], f"no learning: {errs[0]} -> {errs[-1]}"


def test_fea_only_production_keeps_rates_differ(raw_corpus):
    """Production (fea_only) raw-wave chunk: labels are absent so
    lab_end_index == end_index, but rates_differ must still be True (from
    the window config) so the forward pass converts sample lengths to
    output-frame counts and keeps batch size 1 (ADVICE r1 medium)."""
    chunk = load_chunk(_dataset(raw_corpus), ["wave"], [], MSL, fea_only=True)
    assert chunk.labs.size == 0
    assert np.array_equal(chunk.lab_end_index, chunk.end_index)
    assert chunk.rates_differ
    assert chunk.window_shift == SHIFT and chunk.window_size == WIN
    # the posterior row count the forward writer will emit per utterance
    for ln in chunk.sentence_lengths:
        n_out = (int(ln) - WIN) // SHIFT + 1
        assert n_out > 0


def test_curriculum_keeps_rawwave_tuple():
    """increase_seq_length_train must NOT replace the raw-wave 6-tuple with
    a bare int (that would destroy the sample<->frame rate relation); the
    reference no-ops the curriculum for the tuple (utils.py:1083-1092)."""
    from tpukaldi.config.cfg import BatchesSpec

    b = BatchesSpec(
        batch_size_train=[8, 8],
        max_seq_length_train=[MSL, MSL],
        increase_seq_length_train=True,
        start_seq_len_train=100,
        multply_factor_seq_len_train=2,
        batch_size_valid=8,
        max_seq_length_valid=500,
    )
    assert b.seq_length_for_epoch(0) == MSL
    assert b.seq_length_for_epoch(1) == MSL
    # int cfgs keep the growing curriculum
    b2 = BatchesSpec([8, 8], [500, 500], True, 100, 2, 8, 500)
    assert b2.seq_length_for_epoch(0) == 100
    assert b2.seq_length_for_epoch(1) == 200


def test_zero_step_tuple_raises(raw_corpus):
    """A 6-tuple with step 0 previously hung _split_sentence forever; it
    must raise instead."""
    bad = [32000, 0, 199, 199, SHIFT, WIN]
    with pytest.raises(ValueError, match="steps must be positive"):
        load_chunk(_dataset(raw_corpus), ["wave"], ["lab_cd"], bad)


def test_wav_sniffing_survives_long_keys(tmp_path):
    """RIFF detection reads past the utterance key: an ark whose first key
    is ~58+ chars previously pushed 'RIFF' out of the fixed 64-byte sniff
    window and misrouted the ark into the matrix parser."""
    import struct

    from tpukaldi.data.chunk_loader import load_chunk_stream

    key = "SPEAKER_0001_SESSION_0001_CHANNEL_01_SEGMENT_000123-000456_A"
    assert len(key) > 58
    sig = (np.sin(np.arange(2000) / 10.0) * 3000).astype("<i2")
    riff = (b"RIFF" + struct.pack("<I", 36 + sig.nbytes) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
            + b"data" + struct.pack("<I", sig.nbytes) + sig.tobytes())
    ark = tmp_path / "w.ark"
    with open(ark, "wb") as f:
        offs = {}
        f.write(key.encode() + b" ")
        offs[key] = f.tell()
        f.write(riff)
    scp = tmp_path / "w.scp"
    scp.write_text(f"{key} {ark}:{offs[key]}\n")
    fea = FeatureSpec("wave", str(scp), "", 0, 0)
    names, feats, labs, ei, lei = load_chunk_stream(fea, None, -1,
                                                    fea_only=True)
    assert names == [key]
    assert feats.shape[0] == 2000  # samples, not a misparsed matrix


def test_riff_pad_byte_after_odd_chunk(tmp_path):
    """Spec-valid wavs word-align chunks: an odd-sized LIST chunk before
    'data' must not shift the parse by its pad byte."""
    import struct

    from tpukaldi.io.kaldi_io import _read_riff_wav

    sig = (np.arange(100) * 10).astype("<i2")
    odd = b"INFOx"  # 5 bytes -> pad byte required
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
            + b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
            + b"data" + struct.pack("<I", sig.nbytes) + sig.tobytes())
    riff = b"RIFF" + struct.pack("<I", len(body)) + body
    import io

    out = _read_riff_wav(io.BytesIO(riff))
    np.testing.assert_array_equal(out, sig.astype(np.float32))


def test_multistream_load_count(tmp_path, monkeypatch):
    """F feature streams x L label streams must cost F + L - 1 stream
    loads, not F x L (the extra passes were full ark reads whose data was
    discarded)."""
    import tpukaldi.data.chunk_loader as cl
    from tpukaldi.io import ArkScpWriter as W

    rng = np.random.default_rng(1)
    root = tmp_path
    for stream in ("a", "b", "c"):
        with W(str(root / f"{stream}.ark"), str(root / f"{stream}.scp")) as w:
            for i in range(4):
                w.write(f"utt{i}", rng.standard_normal((20, 3)).astype(np.float32))
    with open(root / "labs.ark", "wb") as f:
        for i in range(4):
            write_vec_int(f, rng.integers(0, 3, 20), key=f"utt{i}")
    ds = DatasetSpec(
        name="ms", section="dataset1",
        features={s: FeatureSpec(s, str(root / f"{s}.scp"), "", 0, 0)
                  for s in ("a", "b", "c")},
        labels={f"lab{j}": LabelSpec(f"lab{j}", str(root / "labs.ark"), "")
                for j in range(2)},
        n_chunks=1,
    )
    calls = {"n": 0}
    real = cl.load_chunk_stream

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(cl, "load_chunk_stream", counting)
    chunk = cl.load_chunk(ds, ["a", "b", "c"], ["lab0", "lab1"], 1000)
    assert calls["n"] == 4  # F + L - 1 = 3 + 2 - 1
    assert chunk.feats.shape[1] == 9 and chunk.labs.shape[1] == 2


def test_forward_converts_lengths_to_frame_rate(raw_corpus, monkeypatch):
    """Bidirectional reversal runs at the OUTPUT frame rate: for raw-wave
    forward the in-graph lengths must be converted from sample counts
    ((ln - window)//shift + 1), or every reversed index clamps to the last
    frame and the backward direction sees a constant input."""
    from tpukaldi.train.chunk_runtime import ChunkRuntime

    chunk = load_chunk(_dataset(raw_corpus), ["wave"], [], MSL, fea_only=True)
    assert chunk.rates_differ

    captured = []

    class FakeRuntime(ChunkRuntime):
        def __init__(self):  # bypass the exp-requiring constructor
            self.exp = type("E", (), {"forward": None})()

        def ensure_initialized(self, *a, **k):
            pass

        def restore_from(self, *a, **k):
            pass

        def _forward_step(self, params, stats, feats, lengths):
            captured.append(np.asarray(lengths))
            return {"out": jnp.zeros((feats.shape[0], feats.shape[1], 4))}

    rt = FakeRuntime()
    rt.params, rt.batch_stats = {}, {}

    class NullWriter:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def write(self, *a):
            pass

    import tpukaldi.train.chunk_runtime as cr

    monkeypatch.setattr(cr, "PosteriorWriter", lambda *a, **k: NullWriter())
    task = type("T", (), {"info_file": "/dev/null", "pretrain_files": {}})()
    rt._run_forward(task, chunk)
    assert captured
    for lens, expect_samples in zip(captured, chunk.sentence_lengths):
        n_frames = (int(expect_samples) - WIN) // SHIFT + 1
        assert lens.tolist() == [n_frames]
