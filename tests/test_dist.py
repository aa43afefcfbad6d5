"""Distribution tests on the virtual 8-device CPU mesh: sharded train step
numerically matches single-device, run-to-run determinism of the whole
experiment, graft entry points."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpukaldi.config import load_config
from tpukaldi.data import iter_seq_batches, load_chunk
from tpukaldi.data.synth import generate_corpus, write_cfg
from tpukaldi.dist import data_parallel_mesh, replicate, shard_batch
from tpukaldi.graph import build_graph, init_graph
from tpukaldi.train import make_all_optimizers, make_train_step


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("dist")
    corpus = generate_corpus(str(root / "c"), n_utts=16, seed=3, noise=0.4)
    cfg = write_cfg(corpus, str(root / "e"), arch="liGRU", hidden=16,
                    n_epochs=1, n_chunks=1, batch_size=8, cw=0)
    exp = load_config(cfg)
    chunk = load_chunk(exp.datasets["synth_tr"], ["mfcc"], ["lab_cd"], 1000)
    return exp, chunk


def test_mesh_has_8_devices():
    mesh = data_parallel_mesh()
    assert mesh.shape["data"] == 8


def test_sharded_step_matches_single_device(setup):
    """Data-parallel psum gradients == single-device gradients: one step
    from identical init must produce identical params (f32 tolerance)."""
    exp, chunk = setup
    batch = next(iter_seq_batches(chunk, 8, rng=None))
    feats, labs = jnp.asarray(batch.feats), jnp.asarray(batch.labs)
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    params, stats = init_graph(graph, jax.random.key(0), feats)
    optimizers = make_all_optimizers({n: exp.archs[n] for n in graph.arch_names})

    def one_step(mesh):
        p = jax.device_get(params)
        s = jax.device_get(stats)
        p = jax.tree_util.tree_map(jnp.asarray, p)
        s = jax.tree_util.tree_map(jnp.asarray, s)
        opt = {n: optimizers[n].init(p[n]) for n in graph.arch_names}
        step = make_train_step(graph, optimizers, mesh=mesh, donate=False)
        f, l = feats, labs
        if mesh is not None:
            p = replicate(p, mesh)
            s = replicate(s, mesh)
            f = shard_batch(np.asarray(batch.feats), mesh, batch_axis=1)
            l = shard_batch(np.asarray(batch.labs), mesh, batch_axis=1)
        new_p, _, _, loss, err = step(p, s, opt, f, l, jax.random.key(7))
        return jax.device_get(new_p), float(loss), float(err)

    p_single, loss_s, err_s = one_step(None)
    p_mesh, loss_m, err_m = one_step(data_parallel_mesh())
    assert abs(loss_s - loss_m) < 1e-5
    assert abs(err_s - err_m) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(p_single),
                    jax.tree_util.tree_leaves(p_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_bf16_step_runs_and_matches(setup):
    """bf16 compute + data-parallel mesh compose: the cast sits inside the
    sharded loss, gradients psum in f32, and the sharded bf16 step agrees
    with the single-device bf16 step."""
    exp, chunk = setup
    batch = next(iter_seq_batches(chunk, 8, rng=None))
    feats, labs = jnp.asarray(batch.feats), jnp.asarray(batch.labs)
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    params, stats = init_graph(graph, jax.random.key(0), feats)
    optimizers = make_all_optimizers({n: exp.archs[n] for n in graph.arch_names})

    def one_step(mesh):
        p = jax.tree_util.tree_map(jnp.asarray, jax.device_get(params))
        s = jax.tree_util.tree_map(jnp.asarray, jax.device_get(stats))
        opt = {n: optimizers[n].init(p[n]) for n in graph.arch_names}
        step = make_train_step(graph, optimizers, mesh=mesh, donate=False,
                               compute_dtype=jnp.bfloat16)
        f, l = feats, labs
        if mesh is not None:
            p = replicate(p, mesh)
            s = replicate(s, mesh)
            f = shard_batch(np.asarray(batch.feats), mesh, batch_axis=1)
            l = shard_batch(np.asarray(batch.labs), mesh, batch_axis=1)
        new_p, _, _, loss, err = step(p, s, opt, f, l, jax.random.key(7))
        return jax.device_get(new_p), float(loss), float(err)

    p_single, loss_s, err_s = one_step(None)
    p_mesh, loss_m, err_m = one_step(data_parallel_mesh())
    assert np.isfinite(loss_s) and np.isfinite(loss_m)
    assert abs(loss_s - loss_m) < 1e-2  # bf16 reduction-order tolerance
    for a, b in zip(jax.tree_util.tree_leaves(p_single),
                    jax.tree_util.tree_leaves(p_mesh)):
        assert a.dtype == jnp.float32  # masters stay f32 under the mesh
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-4)


def test_experiment_determinism(tmp_path_factory):
    """Same cfg + seed in fresh out_folders -> identical res.res
    (chunk-resume determinism contract, SURVEY.md §7.4 item 6)."""
    from tpukaldi.tools.run_exp import run_experiment

    root = tmp_path_factory.mktemp("det")
    corpus = generate_corpus(str(root / "c"), n_utts=8, seed=17, noise=0.5)
    results = []
    for run in range(2):
        out = str(root / f"run{run}")
        cfg = write_cfg(corpus, out, arch="MLP", n_epochs=2, n_chunks=2,
                        batch_size=32, lr=0.2)
        run_experiment(cfg)
        import re

        text = "\n".join(
            l for l in open(os.path.join(out, "res.res")).read().splitlines()
            if not l.startswith("phases ")  # wall-time diagnostics
        )
        results.append(re.sub(r"time\(s\)=\d+", "time(s)=X", text))
    assert results[0] == results[1]


def test_graft_entry_dryrun():
    import importlib.util
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(repo, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (200 * 8, 1944)
    mod.dryrun_multichip(8)


def test_multistep_with_mesh(tmp_path_factory, monkeypatch):
    """Fused K-step dispatch composes with data-parallel mesh sharding."""
    monkeypatch.setenv("TPUKALDI_MULTISTEP", "2")
    from tpukaldi.tools.run_exp import run_experiment

    root = tmp_path_factory.mktemp("msmesh")
    corpus = generate_corpus(str(root / "c"), n_utts=16, seed=23, noise=0.4)
    out = str(root / "e")
    cfg = write_cfg(corpus, out, arch="MLP", n_epochs=1, n_chunks=1,
                    batch_size=16, lr=0.2)
    run_experiment(cfg, use_mesh=True)
    lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
    assert len(lines) == 1
    import re

    err = float(re.search(r"valid=\S+ loss=\S+ err=(\d+\.\d+)", lines[0]).group(1))
    assert err < 0.5
