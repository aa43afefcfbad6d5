"""Graph compiler + train step tests: the DSL compiles to a jitted function,
training reduces loss/err on the synthetic corpus, checkpoints round-trip,
bucket-padded bidirectional forward matches unpadded."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpukaldi.config import load_config
from tpukaldi.data import load_chunk, iter_frame_batches
from tpukaldi.data.synth import generate_corpus, write_cfg
from tpukaldi.graph import apply_graph, build_graph, init_graph
from tpukaldi.plan import build_plan
from tpukaldi.train import (
    ChunkRuntime,
    make_all_optimizers,
    make_forward_step,
    make_train_step,
    read_info,
    save_checkpoint,
    load_checkpoint,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("gt")
    corpus = generate_corpus(str(root / "corpus"), n_utts=10, seed=11, noise=0.4)
    cfg = write_cfg(corpus, str(root / "exp"), arch="MLP", n_epochs=2, n_chunks=2,
                    batch_size=64, lr=0.2)
    exp = load_config(cfg)
    os.makedirs(exp.out_folder, exist_ok=True)
    ds = exp.datasets["synth_tr"]
    chunk = load_chunk(ds, ["mfcc"], ["lab_cd"], 1000, shuffle_frames=True, seed=1)
    return exp, chunk, corpus, root


def test_build_and_init_graph(setup):
    exp, chunk, *_ = setup
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    assert not graph.seq_model
    assert graph.out_dims["out_dnn1"] == 10
    batch = next(iter_frame_batches(chunk, 64))
    params, stats = init_graph(graph, jax.random.key(0), jnp.asarray(batch.feats))
    assert "MLP_layers1" in params
    outs, _ = apply_graph(
        graph, params, stats, jnp.asarray(batch.feats), jnp.asarray(batch.labs),
        train=False,
    )
    assert outs["loss_final"].shape == ()
    assert outs["err_final"].shape == ()
    assert outs["out_dnn1"].shape == (64, 10)


def test_training_reduces_loss(setup):
    exp, chunk, *_ = setup
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    batch = next(iter_frame_batches(chunk, 64))
    params, stats = init_graph(graph, jax.random.key(0), jnp.asarray(batch.feats))
    optimizers = make_all_optimizers({n: exp.archs[n] for n in graph.arch_names})
    opt_states = {n: optimizers[n].init(params[n]) for n in graph.arch_names}
    step = make_train_step(graph, optimizers, donate=False)
    rng = jax.random.key(0)
    losses = []
    for epoch in range(3):
        for b in iter_frame_batches(chunk, 64):
            rng, sub = jax.random.split(rng)
            params, stats, opt_states, loss, err = step(
                params, stats, opt_states, jnp.asarray(b.feats),
                jnp.asarray(b.labs), sub,
            )
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, f"no learning: {losses[0]} -> {losses[-1]}"


def test_frozen_arch_not_updated(setup):
    exp, chunk, *_ = setup
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    batch = next(iter_frame_batches(chunk, 64))
    params, stats = init_graph(graph, jax.random.key(0), jnp.asarray(batch.feats))
    optimizers = make_all_optimizers({n: exp.archs[n] for n in graph.arch_names})
    opt_states = {n: optimizers[n].init(params[n]) for n in graph.arch_names}
    step = make_train_step(
        graph, optimizers, frozen={"MLP_layers1": True}, donate=False
    )
    p0 = jax.device_get(params)
    rng = jax.random.key(0)
    params2, *_ = step(params, stats, opt_states, jnp.asarray(batch.feats),
                       jnp.asarray(batch.labs), rng)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(jax.device_get(params2))):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_roundtrip(tmp_path, setup):
    exp, chunk, *_ = setup
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    batch = next(iter_frame_batches(chunk, 8))
    params, stats = init_graph(graph, jax.random.key(0), jnp.asarray(batch.feats))
    path = str(tmp_path / "a.ckpt")
    save_checkpoint(path, params["MLP_layers1"], None, stats["MLP_layers1"])
    p, o, s = load_checkpoint(path, params["MLP_layers1"], None, stats["MLP_layers1"])
    for a, b in zip(jax.tree_util.tree_leaves(params["MLP_layers1"]),
                    jax.tree_util.tree_leaves(p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunk_runtime_full_loop(setup):
    """Train 2 epochs through the runtime ledger, then forward to posterior
    arks — the minimum end-to-end slice of SURVEY.md §7.3 minus decoding."""
    exp, _, corpus, root = setup
    plan = build_plan(exp)
    rt = ChunkRuntime(exp)
    errs = []
    for ep in plan.epochs:
        for task in ep.tasks:
            lr = {n: exp.archs[n].lr[ep.epoch] for n in exp.archs}
            res = rt.run_task(
                task, epoch_lr=lr,
                max_seq_length=exp.batches.max_seq_length_train[ep.epoch],
                batch_size=exp.batches.batch_size_train[ep.epoch],
            )
            assert os.path.exists(task.info_file)
            if task.phase == "valid":
                errs.append(res.err)
    assert errs[-1] < 0.5, f"validation err did not drop: {errs}"
    # info files parse back
    info = read_info(plan.epochs[0].tasks[0].info_file)
    assert "loss" in info

    # forward: save final ckpts then emit posteriors
    from tpukaldi.train import save_all

    save_all(plan.final_ckpts, rt.params, rt.opt_states, rt.batch_stats)
    for task in plan.forward_tasks:
        res = rt.run_task(task)
        assert res.n_batches > 0
    # posterior ark is readable and row counts match utterance lengths
    from tpukaldi.io import read_mat_ark

    ark = plan.forward_tasks[0].info_file.replace(
        ".info", "_out_dnn1_to_decode.ark"
    )
    posts = dict(read_mat_ark(ark))
    assert len(posts) > 0
    for key, mat in posts.items():
        assert mat.shape[1] == 10
        assert np.isfinite(mat).all()

    # resume semantics: re-running a done task is skippable via the ledger
    assert all(t.done for ep in plan.epochs for t in ep.tasks)


def test_bucketed_bidir_forward_exact():
    """Padding an utterance to a bucket must not change bidir outputs for
    the valid frames (lengths-aware reversal)."""
    from tpukaldi.models import liGRU

    T, D, H = 37, 8, 12
    opts = {
        "ligru_lay": str(H), "ligru_drop": "0.0",
        "ligru_use_laynorm_inp": "False", "ligru_use_batchnorm_inp": "False",
        "ligru_use_laynorm": "False", "ligru_use_batchnorm": "False",
        "ligru_bidir": "True", "ligru_act": "relu", "ligru_orthinit": "True",
    }
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, 1, D)).astype(np.float32)
    model = liGRU(options=opts, inp_dim=D)
    v = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    out_unpadded = model.apply(v, jnp.asarray(x), train=False)
    T_pad = 50
    xp = np.zeros((T_pad, 1, D), dtype=np.float32)
    xp[:T] = x
    out_padded = model.apply(
        v, jnp.asarray(xp), train=False, lengths=jnp.asarray([T])
    )
    np.testing.assert_allclose(
        np.asarray(out_padded)[:T], np.asarray(out_unpadded), rtol=1e-5, atol=1e-6
    )


def test_grad_clip_option(setup):
    """arch_grad_clip bounds the global grad norm (update magnitude)."""
    import dataclasses

    exp, chunk, *_ = setup
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    batch = next(iter_frame_batches(chunk, 64))
    params, stats = init_graph(graph, jax.random.key(0), jnp.asarray(batch.feats))

    def step_delta(clip):
        archs = {}
        for n in graph.arch_names:
            a = exp.archs[n]
            opts = dict(a.options)
            if clip:
                opts["arch_grad_clip"] = str(clip)
            archs[n] = dataclasses.replace(a, options=opts)
        optimizers = make_all_optimizers(archs)
        opt_states = {n: optimizers[n].init(params[n]) for n in graph.arch_names}
        step = make_train_step(graph, optimizers, donate=False)
        new_params, *_rest = step(params, stats, opt_states,
                                  jnp.asarray(batch.feats),
                                  jnp.asarray(batch.labs), jax.random.key(0))
        total = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(new_params)):
            total += float(jnp.sum((jnp.asarray(a) - jnp.asarray(b)) ** 2))
        return total ** 0.5

    d_clip = step_delta(1e-4)
    d_free = step_delta(None)
    assert d_clip < d_free * 0.5


def test_production_missing_ckpt_errors(tmp_path):
    import re

    import pytest as _pytest

    from tpukaldi.data.synth import generate_corpus, write_cfg
    from tpukaldi.tools.run_exp import run_experiment

    corpus = generate_corpus(str(tmp_path / "c"), n_utts=6, seed=1)
    cfg = write_cfg(corpus, str(tmp_path / "e"), arch="MLP", n_epochs=1,
                    n_chunks=1)
    text = open(cfg).read()
    # make the forward dataset label-free -> production, with no training run
    text = re.sub(
        r"lab = lab_name=lab_cd\n(\tlab_\w+=.*\n)+\nn_chunks = 1\n\n\[data_use\]",
        "lab = lab_name=none\n\nn_chunks = 1\n\n[data_use]",
        text, count=1,
    )
    assert "lab_name=none" in text
    prod = tmp_path / "prod.cfg"
    prod.write_text(text)
    with _pytest.raises(FileNotFoundError, match="final checkpoints"):
        run_experiment(str(prod))


def test_multistep_matches_singles(setup):
    """K fused steps == K individual steps (identical math, one dispatch)."""
    from tpukaldi.train.step import make_train_multistep

    exp, chunk, *_ = setup
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    batches = list(iter_frame_batches(chunk, 64))[:4]
    feats0 = jnp.asarray(batches[0].feats)
    params, stats = init_graph(graph, jax.random.key(0), feats0)
    optimizers = make_all_optimizers({n: exp.archs[n] for n in graph.arch_names})

    def fresh():
        return (
            jax.tree_util.tree_map(jnp.array, jax.device_get(params)),
            jax.tree_util.tree_map(jnp.array, jax.device_get(stats)),
            {n: optimizers[n].init(params[n]) for n in graph.arch_names},
        )

    rngs = jax.random.split(jax.random.key(3), 4)
    # singles
    p, s, o = fresh()
    step = make_train_step(graph, optimizers, donate=False)
    single_losses = []
    for b, r in zip(batches, rngs):
        p, s, o, loss, err = step(p, s, o, jnp.asarray(b.feats),
                                  jnp.asarray(b.labs), r)
        single_losses.append(float(loss))
    p_single = jax.device_get(p)
    # fused
    p, s, o = fresh()
    multi = make_train_multistep(graph, optimizers, donate=False)
    feats_k = jnp.asarray(np.stack([b.feats for b in batches]))
    labs_k = jnp.asarray(np.stack([b.labs for b in batches]))
    p, s, o, losses_k, errs_k = multi(p, s, o, feats_k, labs_k, rngs)
    np.testing.assert_allclose(np.asarray(losses_k), single_losses,
                               rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_single),
                    jax.tree_util.tree_leaves(jax.device_get(p))):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_bucket_padding_masked_from_cost(tmp_path):
    """Bucket-padded loss/err must equal the unbucketed (reference-exact)
    values: rows at t >= batch-max are excluded from the cost means
    (ADVICE r1: padding inflated cost_nll/cost_err and biased class 0)."""
    from tpukaldi.data import iter_seq_batches
    from tpukaldi.train import make_eval_step

    corpus = generate_corpus(str(tmp_path / "c"), n_utts=6, seed=5,
                             min_len=30, max_len=42)
    cfg = write_cfg(corpus, str(tmp_path / "e"), arch="GRU", hidden=16,
                    batch_size=3, cw=0)
    exp = load_config(cfg)
    chunk = load_chunk(exp.datasets["synth_tr"], ["mfcc"], ["lab_cd"], 1000)
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)

    bucketed = list(iter_seq_batches(chunk, 3, pad_to_bucket=True))
    exact = list(iter_seq_batches(chunk, 3, pad_to_bucket=False))
    assert bucketed[0].feats.shape[0] > exact[0].feats.shape[0], (
        "fixture must actually exercise bucket padding"
    )
    params, stats = init_graph(
        graph, jax.random.key(0), jnp.asarray(bucketed[0].feats)
    )
    ev = make_eval_step(graph)
    for bb, eb in zip(bucketed, exact):
        assert bb.n_valid_t == eb.feats.shape[0]
        lb, errb = ev(params, stats, jnp.asarray(bb.feats),
                      jnp.asarray(bb.labs),
                      jnp.asarray(bb.n_valid_t, dtype=jnp.int32))
        le, erre = ev(params, stats, jnp.asarray(eb.feats),
                      jnp.asarray(eb.labs),
                      jnp.asarray(eb.feats.shape[0], dtype=jnp.int32))
        np.testing.assert_allclose(float(lb), float(le), rtol=2e-5)
        np.testing.assert_allclose(float(errb), float(erre), rtol=2e-5)


def test_mse_mask_never_crosses_time_rates():
    """n_valid_t counts LABEL-rate frames; an mse cost over FEATURE-rate
    rows on a rate-differing (raw-wave) batch must not be masked with it —
    that would silently drop ~(1-1/window_shift) of the valid signal.  The
    same-rate case keeps the exact bucketed mask."""
    from tpukaldi.config.model_dsl import ModelStatement
    from tpukaldi.graph.compiler import GraphSpec

    def mse_graph(fea_T):
        return GraphSpec(
            stmts=[ModelStatement("loss_final", "mse", "a", "b"),
                   ModelStatement("err_final", "mse", "a", "b")],
            modules={}, archs={},
            fea_layout={"a": (0, 2), "b": (2, 4)},
            lab_layout={"lab_cd": 0},
            out_dims={"a": 2, "b": 2, "loss_final": 1, "err_final": 1},
            seq_model=True,
        )

    rng = np.random.default_rng(3)
    B = 2
    # rates differ: 80 samples vs 8 label frames (shift=10)
    feats = jnp.asarray(rng.standard_normal((80, B, 4)), jnp.float32)
    labs = jnp.zeros((8, B, 1), jnp.int64)
    outs, _ = apply_graph(mse_graph(80), {}, {}, feats, labs, train=False,
                          to_do="valid", n_valid_t=jnp.asarray(6))
    expect_all = float(jnp.mean((feats[..., :2] - feats[..., 2:]) ** 2))
    np.testing.assert_allclose(float(outs["loss_final"]), expect_all,
                               rtol=1e-6)

    # same rate: mask applies (first 6 of 8 rows)
    feats_s = jnp.asarray(rng.standard_normal((8, B, 4)), jnp.float32)
    outs, _ = apply_graph(mse_graph(8), {}, {}, feats_s, labs, train=False,
                          to_do="valid", n_valid_t=jnp.asarray(6))
    expect_masked = float(
        jnp.mean((feats_s[:6, :, :2] - feats_s[:6, :, 2:]) ** 2)
    )
    np.testing.assert_allclose(float(outs["loss_final"]), expect_masked,
                               rtol=1e-6)


def test_forward_outs_order_independent(setup):
    """to_do='forward' must compute EVERY requested output regardless of
    the forward_out list order vs program order (stopping at the list's
    last element would skip outs the program computes later)."""
    import jax.numpy as jnp

    exp, chunk, *_ = setup
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    batch = next(iter_frame_batches(chunk, 64))
    params, stats = init_graph(graph, jax.random.key(0),
                               jnp.asarray(batch.feats))
    # request the model's final out AND a feature slice listed after it;
    # the slice "exists" from statement 0, so the old last-element break
    # would be before the final out for the reversed order
    final_out = graph.forward_outs[-1]
    first_computed = next(s.out for s in graph.stmts if s.op == "compute")
    for order in ([first_computed, final_out], [final_out, first_computed]):
        graph.forward_outs = list(order)
        outs, _ = apply_graph(
            graph, params, stats, jnp.asarray(batch.feats), None,
            train=False, to_do="forward",
        )
        for name in order:
            assert name in outs, (order, sorted(outs))
