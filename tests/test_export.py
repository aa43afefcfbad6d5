"""Serving export tests: a trained experiment exports to a StableHLO
artifact whose reloaded forward matches the live posteriors, with a
symbolic time axis (one artifact serves any utterance length)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpukaldi.data.synth import generate_corpus, write_cfg
from tpukaldi.tools.export_model import export_forward, load_exported
from tpukaldi.tools.run_exp import run_experiment


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp0")
    corpus = generate_corpus(str(root / "c"), n_utts=10, seed=13, noise=0.4)
    out = str(root / "e")
    cfg = write_cfg(corpus, out, arch="liGRU", hidden=16, n_epochs=1,
                    n_chunks=1, batch_size=4, cw=0, lr=0.05)
    run_experiment(cfg)
    return cfg, out, corpus


def _live_forward(cfg, feats, lengths):
    """Ground truth: the same forward through the live runtime path."""
    from tpukaldi.config import load_config
    from tpukaldi.graph.compiler import build_graph, init_graph
    from tpukaldi.tools.export_model import _sample_chunk
    from tpukaldi.train import checkpoint as ckpt
    from tpukaldi.train.step import make_forward_step

    exp = load_config(cfg)
    chunk = _sample_chunk(exp)
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    params, stats = init_graph(
        graph, jax.random.key(exp.seed), jnp.asarray(feats)
    )
    ef = os.path.join(exp.out_folder, "exp_files")
    finals = {a: os.path.join(ef, f"final_{a}.ckpt")
              for a in graph.arch_names}
    params, _, stats = ckpt.load_all(finals, params, None, stats)
    return make_forward_step(graph)(
        params, stats, jnp.asarray(feats), jnp.asarray(lengths, jnp.int32)
    )


def test_export_roundtrip_matches_live(trained, tmp_path):
    cfg, out, _ = trained
    art = export_forward(cfg, str(tmp_path / "art"))
    model = load_exported(str(tmp_path / "art"))
    assert model.meta["seq_model"] is True
    assert model.meta["outs"]

    assert model.meta["batch"] == 0  # fully symbolic (any T, any B)
    rng = np.random.default_rng(3)
    # two lengths AND two batch sizes through ONE artifact
    for T, B in ((23, 1), (57, 3)):
        feats = rng.standard_normal(
            (T, B, model.meta["inp_dim"])
        ).astype(np.float32)
        lengths = np.asarray([T] * B, np.int32)
        got = model.call(feats, lengths)
        want = _live_forward(cfg, feats, lengths)
        assert set(got) == set(want)
        for k in got:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]), rtol=1e-4,
                atol=1e-4,
            )
            # log-softmax posteriors normalize in prob space
            np.testing.assert_allclose(
                np.exp(np.asarray(got[k], np.float64)).sum(axis=1), 1.0,
                atol=1e-3,
            )


def test_export_normalized_bakes_priors(trained, tmp_path):
    cfg, out, _ = trained
    art = export_forward(cfg, str(tmp_path / "artn"), normalize=True)
    model = load_exported(str(tmp_path / "artn"))
    assert model.meta["normalized"], "priors should be baked"
    rng = np.random.default_rng(5)
    T = 31
    feats = rng.standard_normal((T, 1, model.meta["inp_dim"])).astype(
        np.float32
    )
    raw = load_exported(
        export_forward(cfg, str(tmp_path / "artr"))
    ).call(feats, [T])
    normed = model.call(feats, [T])
    name = model.meta["normalized"][0]
    diff = np.asarray(raw[name]) - np.asarray(normed[name])
    # difference is exactly the (row-constant) log-prior vector
    np.testing.assert_allclose(
        diff, np.broadcast_to(diff[0:1], diff.shape), rtol=1e-5, atol=1e-5
    )
    assert np.abs(diff[0]).max() > 1e-3


def test_export_cli(trained, tmp_path):
    import subprocess
    import sys

    cfg, out, _ = trained
    art = str(tmp_path / "cli_art")
    import tpukaldi

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(
        tpukaldi.__file__
    )))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "tpukaldi.tools.export_model", cfg,
         "--out", art],
        capture_output=True, text=True, env=env, cwd=repo_root,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(art, "forward.stablehlo"))
    assert os.path.exists(os.path.join(art, "meta.json"))


@pytest.mark.parametrize("arch", ["GRU", "LSTM", "SRU", "QLSTM"])
def test_export_zoo_family(arch, tmp_path_factory):
    """Every recurrent family exports and the artifact serves finite,
    normalized posteriors; symbolic batch where the graph allows it
    (meta.batch==0), otherwise the documented batch=1 fallback."""
    root = tmp_path_factory.mktemp(f"exz_{arch}")
    corpus = generate_corpus(str(root / "c"), n_utts=8, feat_dim=12,
                             seed=17, min_len=30, max_len=60, noise=0.4)
    out = str(root / "e")
    cfg = write_cfg(corpus, out, arch=arch, hidden=16, n_epochs=1,
                    n_chunks=1, batch_size=4, cw=0, lr=0.05)
    run_experiment(cfg)
    art = export_forward(cfg, str(root / "art"))
    model = load_exported(art)
    B = 2 if model.meta["batch"] == 0 else model.meta["batch"]
    T = 19
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((T, B, model.meta["inp_dim"])).astype(
        np.float32
    )
    outs = model.call(feats, [T] * B)
    for v in outs.values():
        v = np.asarray(v)
        assert v.shape[0] == T * B
        assert np.isfinite(v).all()
        np.testing.assert_allclose(
            np.exp(v.astype(np.float64)).sum(axis=1), 1.0, atol=1e-3
        )


def test_export_bf16_experiment_records_dtype(tmp_path_factory):
    """A bf16-trained cfg exports with the same compute dtype its
    ledger/decode posteriors used (meta.compute_dtype=bfloat16)."""
    root = tmp_path_factory.mktemp("exb16")
    corpus = generate_corpus(str(root / "c"), n_utts=8, seed=23, noise=0.4)
    out = str(root / "e")
    cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=1,
                    n_chunks=1, batch_size=32, lr=0.2)
    text = open(cfg).read().replace("[exp]", "[exp]\ncompute_dtype = bfloat16",
                                    1)
    open(cfg, "w").write(text)
    run_experiment(cfg)
    art = export_forward(cfg, str(root / "art"))
    model = load_exported(art)
    assert model.meta["compute_dtype"] == "bfloat16"
    assert "per-chunk CMVN" in model.meta["input_contract"]["preprocessing"]
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((9, 2, model.meta["inp_dim"])).astype(
        np.float32
    )
    outs = model.call(feats, [9, 9])
    for v in outs.values():
        v = np.asarray(v)
        assert v.dtype == np.float32 and np.isfinite(v).all()
        np.testing.assert_allclose(
            np.exp(v.astype(np.float64)).sum(axis=1), 1.0, atol=1e-2
        )


def test_export_requires_trained_checkpoints(tmp_path):
    corpus = generate_corpus(str(tmp_path / "c"), n_utts=6, seed=1)
    cfg = write_cfg(corpus, str(tmp_path / "e"), arch="MLP", n_epochs=1,
                    n_chunks=1)
    with pytest.raises(FileNotFoundError, match="final checkpoints"):
        export_forward(cfg, str(tmp_path / "a"))
