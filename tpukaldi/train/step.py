"""Jitted train/eval/forward steps over the compiled graph.

The reference's inner loop (core.py:614-642): forward DSL -> backward on
loss_final -> step every unfrozen per-arch optimizer.  Here the whole step
is one jitted function: value_and_grad over the dict of per-arch param
trees, per-arch optax updates (frozen archs get zeroed updates so the
compiled step is branch-free), batchnorm state threaded functionally.

Data-parallel: `make_train_step(..., mesh=...)` shards the batch over the
mesh's 'data' axis with NamedSharding constraints; gradients are averaged
by XLA's compiler-inserted psum over ICI (SURVEY.md §2.4 rebuild note).

Mixed precision (`compute_dtype=jnp.bfloat16`, cfg `[exp] compute_dtype` /
env TPUKALDI_COMPUTE_DTYPE): master params, optimizer state, batchnorm
statistics and the loss stay f32; params and features are cast to bf16 at
step entry so every matmul streams half the bytes through HBM/VMEM (TPU
matmuls already multiply in bf16 at DEFAULT precision — the win here is
bandwidth, not MXU passes).  Gradients accumulate in f32 automatically
through the cast's VJP.  Numerically sensitive reductions (softmax, layer/
batch-norm moments, cost means, sinc synthesis) are pinned to f32 inside
the models, so the mode is a pure-throughput knob.
"""

from __future__ import annotations


from typing import Dict, Optional

import jax
import jax.numpy as jnp

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.compiler import GraphSpec, apply_graph


# param names kept f32 even in bf16 mode: values whose SEMANTIC range
# (e.g. band edges in Hz) far exceeds bf16's ~3 significant digits, and
# whose per-step updates would be quantized away before the (f32) use
# site ever sees them.  Matched as path-name substrings.
_CAST_EXEMPT = ("low_hz", "band_hz")


def _cast_compute(params, feats, compute_dtype):
    """Cast float params/features to the compute dtype at step entry.
    f32 (or None) is the identity; int leaves (none today) pass through.
    Leaves whose path matches `_CAST_EXEMPT` stay f32 (their consumers
    upcast anyway, so no promotion leaks into the bf16 graph)."""
    if compute_dtype is None or compute_dtype == jnp.float32:
        return params, feats

    def cast(path, x):
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        for entry in path:
            name = getattr(entry, "key", None) or getattr(entry, "name", "")
            if any(sub in str(name) for sub in _CAST_EXEMPT):
                return x
        return x.astype(compute_dtype)

    return (
        jax.tree_util.tree_map_with_path(cast, params),
        feats.astype(compute_dtype),
    )


def _constrain_batch(feats, labs, mesh):
    """Shard the batch axis over the mesh 'data' axis for both tensors —
    (T, B, D) shards B, (N, D) shards N.  Single place so train/eval/
    multistep stay consistent."""
    if mesh is None:
        return feats, labs
    batch_axis = 1 if feats.ndim == 3 else 0
    spec = [None] * feats.ndim
    spec[batch_axis] = "data"
    feats = jax.lax.with_sharding_constraint(
        feats, NamedSharding(mesh, P(*spec))
    )
    if labs is not None:
        lspec = [None] * labs.ndim
        lspec[batch_axis] = "data"
        labs = jax.lax.with_sharding_constraint(
            labs, NamedSharding(mesh, P(*lspec))
        )
    return feats, labs


def _loss_fn(params, graph, batch_stats, feats, labs, rngs, n_valid_t,
             compute_dtype=None):
    # cast INSIDE the differentiated function: the cast's VJP accumulates
    # the incoming bf16 cotangents into f32 master-param gradients
    params, feats = _cast_compute(params, feats, compute_dtype)
    outs, new_stats = apply_graph(
        graph, params, batch_stats, feats, labs, train=True, rngs=rngs,
        to_do="train", n_valid_t=n_valid_t,
    )
    return outs["loss_final"], (outs["err_final"], new_stats)


def _make_step_body(graph, optimizers, frozen, mesh, compute_dtype=None):
    frozen = frozen or {}

    def step(params, batch_stats, opt_states, feats, labs, rng,
             n_valid_t=None):
        feats, labs = _constrain_batch(feats, labs, mesh)
        rngs = {"dropout": rng}
        (loss, (err, new_stats)), grads = jax.value_and_grad(
            _loss_fn, has_aux=True
        )(params, graph, batch_stats, feats, labs, rngs, n_valid_t,
          compute_dtype)
        new_params = dict(params)
        new_opt_states = dict(opt_states)
        for name in params:
            if frozen.get(name, False):
                continue
            updates, new_opt_states[name] = optimizers[name].update(
                grads[name], opt_states[name], params[name]
            )
            new_params[name] = jax.tree_util.tree_map(
                lambda p, u: p + u, params[name], updates
            )
        return new_params, new_stats, new_opt_states, loss, err

    return step


def make_train_step(
    graph: GraphSpec,
    optimizers: Dict,
    frozen: Optional[Dict[str, bool]] = None,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    compute_dtype=None,
):
    """Returns jitted `step(params, batch_stats, opt_states, feats, labs,
    rng) -> (params, batch_stats, opt_states, loss, err)`.

    Sequential batches are (T, B, D): the batch axis B is sharded over the
    mesh 'data' axis; frame batches (N, D) shard N.
    """
    step = _make_step_body(graph, optimizers, frozen, mesh, compute_dtype)
    donate_args = (0, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_train_multistep(
    graph: GraphSpec,
    optimizers: Dict,
    frozen: Optional[Dict[str, bool]] = None,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    compute_dtype=None,
):
    """K sequential optimizer steps fused into ONE jitted dispatch via
    lax.scan over stacked same-shape batches — identical math to K calls of
    make_train_step, but one launch (per-step dispatch latency amortized
    K-fold; matters most when the host<->device link is slow).

    Signature: multi(params, stats, opts, feats (K,...), labs (K,...),
    rngs (K,)) -> (params, stats, opts, losses (K,), errs (K,))."""
    body = _make_step_body(graph, optimizers, frozen, mesh, compute_dtype)

    def multi(params, batch_stats, opt_states, feats_k, labs_k, rngs_k,
              n_valid_k=None):
        def scan_body(carry, xs):
            p, s, o = carry
            f, l, r, nv = xs
            p, s, o, loss, err = body(p, s, o, f, l, r, nv)
            return (p, s, o), (loss, err)

        if n_valid_k is None:
            K = feats_k.shape[0]
            n_valid_k = jax.numpy.full(
                (K,), feats_k.shape[1], dtype=jax.numpy.int32
            )
        (p, s, o), (losses, errs) = jax.lax.scan(
            scan_body, (params, batch_stats, opt_states),
            (feats_k, labs_k, rngs_k, n_valid_k),
        )
        return p, s, o, losses, errs

    donate_args = (0, 2) if donate else ()
    return jax.jit(multi, donate_argnums=donate_args)


def make_eval_step(graph: GraphSpec, mesh: Optional[Mesh] = None,
                   compute_dtype=None):
    def step(params, batch_stats, feats, labs, n_valid_t=None):
        feats, labs = _constrain_batch(feats, labs, mesh)
        params, feats = _cast_compute(params, feats, compute_dtype)
        outs, _ = apply_graph(
            graph, params, batch_stats, feats, labs, train=False,
            to_do="valid", n_valid_t=n_valid_t,
        )
        return outs["loss_final"], outs["err_final"]

    return jax.jit(step)


def make_eval_multistep(graph: GraphSpec, mesh: Optional[Mesh] = None,
                        compute_dtype=None):
    """K eval batches fused into ONE jitted dispatch via lax.scan over
    stacked same-shape batches — identical math to K calls of
    make_eval_step (per-batch means, no state), one launch.  Validation has
    no backward, so per-dispatch latency is a larger fraction of its step
    time than training's; on a slow device link this fusion is what keeps
    the validation stage device-bound.

    Signature: multi(params, stats, feats (K,...), labs (K,...),
    n_valid_k (K,)) -> (losses (K,), errs (K,))."""

    def one(params, batch_stats, feats, labs, n_valid_t):
        feats, labs = _constrain_batch(feats, labs, mesh)
        params, feats = _cast_compute(params, feats, compute_dtype)
        outs, _ = apply_graph(
            graph, params, batch_stats, feats, labs, train=False,
            to_do="valid", n_valid_t=n_valid_t,
        )
        return outs["loss_final"], outs["err_final"]

    def multi(params, batch_stats, feats_k, labs_k, n_valid_k=None):
        if n_valid_k is None:
            K = feats_k.shape[0]
            n_valid_k = jax.numpy.full(
                (K,), feats_k.shape[1], dtype=jax.numpy.int32
            )

        def scan_body(carry, xs):
            f, l, nv = xs
            return carry, one(params, batch_stats, f, l, nv)

        _, (losses, errs) = jax.lax.scan(
            scan_body, 0, (feats_k, labs_k, n_valid_k)
        )
        return losses, errs

    return jax.jit(multi)


def make_forward_step(graph: GraphSpec, out_names: Optional[list] = None,
                      compute_dtype=None, log_priors=None, d2h_dtype=None):
    """Posterior computation for one utterance batch: returns the requested
    forward outputs flattened to (T*B, C).  `lengths` makes bucket-padded
    utterances exact for bidirectional models (padding stays at the end and
    is sliced off by the caller).

    `log_priors` (optional dict out_name -> np.ndarray or None) bakes the
    prior subtraction `out - log(counts/sum(counts))` (reference
    core.py:665-668) into the jitted graph as a fused constant, so the ark
    writer receives decoder-ready matrices and the host never touches the
    (T*B, N_out) posteriors beyond serialization.

    `d2h_dtype` (optional, e.g. jnp.float16) quantizes the FINAL
    prior-normalized log posteriors on device before the device->host
    copy — halving D2H bytes on transfer-bound links (the dev tunnel
    moves ~20 MB/s device->host; a real PCIe host does GB/s).  The ark is
    still written float32; only the values are quantized (~5e-4 relative
    — invisible to a WFST decoder at beam/acwt scales, but OUTSIDE the
    1e-4 posterior parity contract, hence opt-in via
    TPUKALDI_FORWARD_D2H, never default).

    `pack_idx` (optional per call, (cap,) int32): gather of the flattened
    (T*B, C) output BEFORE the device->host copy, packing each utterance's
    real frames contiguously and dropping bucket/batch padding — the D2H
    then moves only real frames (+ slack up to the cap bucket).  On the
    tunneled chip padding was ~30-40% of the posterior-path bytes."""
    out_names = out_names or graph.forward_outs
    priors = {
        name: (None if log_priors is None or log_priors.get(name) is None
               else jnp.asarray(log_priors[name], dtype=jnp.float32))
        for name in out_names
    }

    def step(params, batch_stats, feats, lengths, pack_idx=None):
        params, feats = _cast_compute(params, feats, compute_dtype)
        outs, _ = apply_graph(
            graph, params, batch_stats, feats, None, train=False,
            to_do="forward", lengths=lengths,
        )
        result = {}
        for name in out_names:
            # posterior arks are always f32 (non-softmax forward outs,
            # e.g. enhancement targets, would otherwise emit bf16)
            o = outs[name].astype(jnp.float32)
            if priors[name] is not None:
                o = o - priors[name]
            if d2h_dtype is not None:
                o = o.astype(d2h_dtype)
            o = o.reshape(o.shape[0] * o.shape[1], -1) if o.ndim == 3 else o
            if pack_idx is not None:
                o = jnp.take(o, pack_idx, axis=0)
            result[name] = o
        return result

    return jax.jit(step)
