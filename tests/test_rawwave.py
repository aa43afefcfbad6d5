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
