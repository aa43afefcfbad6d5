"""Mixed-precision (bfloat16 compute) mode tests.

The bf16 mode (train/step.py `compute_dtype`, cfg `[exp] compute_dtype`,
env TPUKALDI_COMPUTE_DTYPE) casts params/features to bf16 at step entry
while master params, optimizer state, batchnorm statistics and every
numerically sensitive reduction (softmax, layer/batch-norm moments, cost
means) stay f32.  These tests pin that contract:

- a bf16 train step tracks the f32 step closely and leaves f32 masters;
- batchnorm running statistics stay f32 with bf16 activations;
- the full driver converges on the synthetic corpus in bf16;
- forward posteriors are emitted f32.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpukaldi.config import load_config
from tpukaldi.data import load_chunk, iter_frame_batches, iter_seq_batches
from tpukaldi.data.synth import generate_corpus, write_cfg
from tpukaldi.graph import build_graph, init_graph
from tpukaldi.train import make_all_optimizers, make_train_step
from tpukaldi.train.step import make_eval_step, make_forward_step


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("bf16")
    corpus = generate_corpus(str(root / "corpus"), n_utts=12, seed=5, noise=0.4)
    cfg = write_cfg(corpus, str(root / "exp"), arch="liGRU", hidden=24,
                    n_epochs=2, n_chunks=2, batch_size=4, lr=0.1)
    exp = load_config(cfg)
    os.makedirs(exp.out_folder, exist_ok=True)
    ds = exp.datasets["synth_tr"]
    chunk = load_chunk(ds, ["mfcc"], ["lab_cd"], 1000, seed=1)
    return exp, chunk, corpus, root


def _graph_state(exp, chunk):
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    batch = next(iter_seq_batches(chunk, 4))
    params, stats = init_graph(graph, jax.random.key(0), jnp.asarray(batch.feats))
    optimizers = make_all_optimizers({n: exp.archs[n] for n in graph.arch_names})
    opt_states = {n: optimizers[n].init(params[n]) for n in graph.arch_names}
    return graph, batch, params, stats, optimizers, opt_states


def test_bf16_step_tracks_f32_and_keeps_f32_masters(setup):
    exp, chunk, *_ = setup
    graph, batch, params, stats, optimizers, opt_states = _graph_state(exp, chunk)
    feats = jnp.asarray(batch.feats)
    labs = jnp.asarray(batch.labs)
    results = {}
    for mode, cdt in (("f32", None), ("bf16", jnp.bfloat16)):
        step = make_train_step(graph, optimizers, donate=False,
                               compute_dtype=cdt)
        p, s, o = params, stats, opt_states
        for i in range(4):
            p, s, o, loss, err = step(p, s, o, feats, labs, jax.random.key(i))
        results[mode] = float(loss)
        # master params and BN running stats stay f32
        for leaf in jax.tree_util.tree_leaves(p):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(s):
            assert leaf.dtype == jnp.float32
        # the loss itself is f32 (cost means pinned)
        assert loss.dtype == jnp.float32
    assert abs(results["f32"] - results["bf16"]) < 0.05, results


def test_bf16_eval_and_forward_outputs_f32(setup):
    exp, chunk, *_ = setup
    graph, batch, params, stats, *_ = _graph_state(exp, chunk)
    feats = jnp.asarray(batch.feats)
    labs = jnp.asarray(batch.labs)
    ev = make_eval_step(graph, compute_dtype=jnp.bfloat16)
    loss, err = ev(params, stats, feats, labs)
    assert loss.dtype == jnp.float32 and np.isfinite(float(loss))
    fw = make_forward_step(graph, compute_dtype=jnp.bfloat16)
    outs = fw(params, stats, feats,
              jnp.asarray(batch.lengths, jnp.int32))
    for v in outs.values():
        assert v.dtype == jnp.float32
        assert np.isfinite(np.asarray(v)).all()
        # log-softmax posteriors: rows normalize to ~1 in prob space
        np.testing.assert_allclose(
            np.exp(np.asarray(v, np.float64)).sum(axis=1), 1.0, atol=1e-3
        )


def test_bf16_close_to_f32_posteriors(setup):
    """Same params, same input: bf16 forward posteriors agree with f32 to
    bf16 resolution (the head log-softmax is pinned f32)."""
    exp, chunk, *_ = setup
    graph, batch, params, stats, *_ = _graph_state(exp, chunk)
    feats = jnp.asarray(batch.feats)
    lens = jnp.asarray(batch.lengths, jnp.int32)
    f32 = make_forward_step(graph)(params, stats, feats, lens)
    b16 = make_forward_step(graph, compute_dtype=jnp.bfloat16)(
        params, stats, feats, lens
    )
    for k in f32:
        a, b = np.asarray(f32[k]), np.asarray(b16[k])
        # compare in probability space (log-posteriors diverge on the
        # tails where probabilities are negligible)
        np.testing.assert_allclose(np.exp(a), np.exp(b), atol=0.05)


def test_bf16_e2e_driver_converges(tmp_path, monkeypatch):
    """Full driver with `[exp] compute_dtype = bfloat16`: trains, anneals,
    and reaches a low validation error on the separable synthetic task."""
    from tpukaldi.tools.run_exp import run_experiment

    corpus = generate_corpus(str(tmp_path / "corpus"), n_utts=16, seed=9,
                             noise=0.3)
    cfg = write_cfg(corpus, str(tmp_path / "exp"), arch="MLP",
                    n_epochs=3, n_chunks=2, batch_size=64, lr=0.2)
    text = open(cfg).read().replace(
        "[exp]", "[exp]\ncompute_dtype = bfloat16", 1
    )
    open(cfg, "w").write(text)
    run_experiment(cfg)
    res = open(os.path.join(str(tmp_path / "exp"), "res.res")).read()
    lines = [l for l in res.strip().splitlines() if l.startswith("ep=")]
    assert len(lines) == 3
    import re

    errs = [float(re.search(r"valid=\S+ loss=[\d.]+ err=([\d.]+)", l).group(1))
            for l in lines]
    assert errs[-1] < 0.15, f"bf16 e2e did not converge: {errs}"


@pytest.mark.parametrize("arch", ["GRU", "LSTM", "RNN", "minimalGRU",
                                  "SRU", "QLSTM", "fusionRNN"])
def test_bf16_zoo_trains_e2e(arch, tmp_path_factory, monkeypatch):
    """Every recurrent family trains through the driver in bf16 compute
    mode.  Families with their own f32 scan state (SRU/QLSTM/fusionRNN)
    silently promote back to f32 — correctness holds either way; this
    pins no-NaN + learning across the zoo."""
    import re

    monkeypatch.setenv("TPUKALDI_COMPUTE_DTYPE", "bfloat16")
    root = tmp_path_factory.mktemp(f"b16_{arch}")
    corpus = generate_corpus(str(root / "c"), n_utts=10, feat_dim=12,
                             seed=31, min_len=40, max_len=120, noise=0.3)
    out = str(root / "exp")
    cfg = write_cfg(corpus, out, arch=arch, hidden=16, n_epochs=1,
                    n_chunks=1, batch_size=4, cw=0, lr=0.05)
    from tpukaldi.tools.run_exp import run_experiment

    run_experiment(cfg)
    res = open(os.path.join(out, "res.res")).read().strip()
    verr = float(re.search(r"valid=\S+ loss=\S+ err=(\d+\.\d+)", res).group(1))
    assert 0.0 < verr < 0.85, f"{arch} bf16 bogus valid err: {res}"


def test_sinc_cutoff_params_exempt_from_bf16_cast():
    """SincNet's low_hz/band_hz live in Hz (up to nyquist): casting them to
    bf16 before the f32 filter synthesis would snap band edges to a
    ~0.4%-relative grid and quantize away small optimizer updates.  They
    must stay f32 through _cast_compute; everything else casts."""
    from tpukaldi.train.step import _cast_compute

    params = {
        "SincNet_layers": {
            "low_hz": jnp.ones((8, 1), jnp.float32),
            "band_hz": jnp.ones((8, 1), jnp.float32),
            "conv1": jnp.ones((4, 4), jnp.float32),
        }
    }
    cast, feats = _cast_compute(params, jnp.ones((3, 4), jnp.float32),
                                jnp.bfloat16)
    assert cast["SincNet_layers"]["low_hz"].dtype == jnp.float32
    assert cast["SincNet_layers"]["band_hz"].dtype == jnp.float32
    assert cast["SincNet_layers"]["conv1"].dtype == jnp.bfloat16
    assert feats.dtype == jnp.bfloat16


def test_bad_compute_dtype_rejected(setup):
    from tpukaldi.train.chunk_runtime import ChunkRuntime

    exp, chunk, *_ = setup
    rt = ChunkRuntime(exp)
    exp.raw["exp"]["compute_dtype"] = "float16"
    with pytest.raises(ValueError, match="compute_dtype"):
        rt._compute_dtype()
    exp.raw["exp"]["compute_dtype"] = "bfloat16"
    assert rt._compute_dtype() == jnp.bfloat16
    del exp.raw["exp"]["compute_dtype"]
    assert rt._compute_dtype() is None
