"""[model] DSL -> one jittable pure function.

The reference re-interprets the DSL strings every minibatch and mutates a
dict of torch modules (utils.py:2296-2419 `forward_model`, :2031 `model_init`).
Here the program is compiled ONCE into a pure function over a dict of
per-architecture param pytrees — everything inside is jit-traceable, shapes
are static, and the same compiled graph serves train/valid/forward (forward
truncates the program at the last requested output, reference
utils.py:2341-2342).

Shape-adaptation semantics preserved (utils.py:2320-2339): sequential
architectures see (T, B, F), non-sequential ones see (T*B, F); costs flatten
to (N, C) with integer labels (N,).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config.cfg import ArchSpec, ExperimentConfig
from ..config.model_dsl import ModelStatement
from ..models import resolve


@dataclass
class GraphSpec:
    """Static compilation of the [model] program against a data layout."""

    stmts: List[ModelStatement]
    modules: Dict[str, Any]  # arch_name -> flax module instance
    archs: Dict[str, ArchSpec]
    fea_layout: Dict[str, Tuple[int, int]]
    lab_layout: Dict[str, int]
    out_dims: Dict[str, int]
    seq_model: bool
    forward_outs: List[str] = field(default_factory=list)

    @property
    def arch_names(self) -> List[str]:
        return list(self.modules)


def build_graph(
    exp: ExperimentConfig,
    fea_layout: Dict[str, Tuple[int, int]],
    lab_layout: Dict[str, int],
) -> GraphSpec:
    """Instantiate modules and chain dims through the DSL program
    (reference model_init, utils.py:2031-2103)."""
    modules: Dict[str, Any] = {}
    out_dims: Dict[str, int] = {
        name: end - beg for name, (beg, end) in fea_layout.items()
    }
    used_archs: Dict[str, ArchSpec] = {}
    for s in exp.model:
        if s.op == "compute":
            arch = exp.archs[s.arg1]
            inp_dim = out_dims[s.arg2]
            if s.arg1 not in modules:
                cls = resolve(arch.class_name, arch.library)
                modules[s.arg1] = cls(options=arch.options, inp_dim=inp_dim)
                used_archs[s.arg1] = arch
            out_dims[s.out] = modules[s.arg1].compute_out_dim(arch.options, inp_dim)
        elif s.op == "concatenate":
            out_dims[s.out] = out_dims[s.arg1] + out_dims[s.arg2]
        elif s.op in ("cost_nll", "cost_err", "mse"):
            out_dims[s.out] = 1
        else:  # mult/sum/avg/const ops preserve dims
            out_dims[s.out] = out_dims[s.arg1]
    seq_model = any(a.seq_model for a in used_archs.values())
    return GraphSpec(
        stmts=list(exp.model),
        modules=modules,
        archs=used_archs,
        fea_layout=fea_layout,
        lab_layout=lab_layout,
        out_dims=out_dims,
        seq_model=seq_model,
        forward_outs=list(exp.forward.outs),
    )


def init_graph(
    graph: GraphSpec, rng: jax.Array, sample_feats: jnp.ndarray
) -> Tuple[Dict, Dict]:
    """Initialize per-arch params and batch_stats from a sample batch."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    outs: Dict[str, jnp.ndarray] = _feature_slices(graph, sample_feats)
    for s in graph.stmts:
        if s.op != "compute":
            if s.op in ("concatenate", "mult", "sum", "avg"):
                if s.arg1 in outs and s.arg2 in outs:
                    # same 2D/3D shim as apply_graph: seq and non-seq
                    # outputs may mix in one elementwise/concat op
                    a, b = _harmonize(outs[s.arg1], outs[s.arg2])
                    if s.op == "concatenate":
                        outs[s.out] = jnp.concatenate([a, b], axis=a.ndim - 1)
                    else:
                        outs[s.out] = a
            elif s.op in ("mult_constant", "sum_constant") and s.arg1 in outs:
                outs[s.out] = outs[s.arg1]
            continue
        if s.arg1 not in params:
            rng, key_p, key_d = jax.random.split(rng, 3)
            module = graph.modules[s.arg1]
            inp = _adapt_for_arch(
                outs[s.arg2], graph.archs[s.arg1].seq_model, sample_feats
            )
            variables = module.init(
                {"params": key_p, "dropout": key_d}, inp, train=False
            )
            # param-free modules (e.g. logMelFb) init to an empty tree
            params[s.arg1] = variables.get("params", {})
            stats[s.arg1] = variables.get("batch_stats", {})
        module = graph.modules[s.arg1]
        inp = _adapt_for_arch(
            outs[s.arg2], graph.archs[s.arg1].seq_model, sample_feats
        )
        variables = {"params": params[s.arg1]}
        if stats[s.arg1]:
            variables["batch_stats"] = stats[s.arg1]
        outs[s.out] = module.apply(variables, inp, train=False)
    return params, stats


def _feature_slices(graph: GraphSpec, feats: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    return {
        name: feats[..., beg:end] for name, (beg, end) in graph.fea_layout.items()
    }


def _adapt_for_arch(x, arch_is_seq: bool, ref):
    """2D<->3D shim (utils.py:2320-2339)."""
    if x.ndim == 3 and not arch_is_seq:
        return x.reshape(x.shape[0] * x.shape[1], -1)
    if x.ndim == 2 and arch_is_seq:
        # recover (T, B) from the reference tensor
        return x.reshape(ref.shape[0], ref.shape[1], -1)
    return x


def _flatten_out(x):
    return x.reshape(x.shape[0] * x.shape[1], -1) if x.ndim == 3 else x


def _harmonize(a, b):
    """Flatten to 2D when mixing outputs of seq (3D) and non-seq (2D)
    architectures in one elementwise op."""
    if a.ndim != b.ndim:
        a, b = _flatten_out(a), _flatten_out(b)
    return a, b


def _row_mask(tb3, n_valid_t):
    """Flattened (T*B,) mask selecting rows with t < n_valid_t, built from a
    3D (T, B, ...) tensor's leading axes."""
    T, B = tb3.shape[0], tb3.shape[1]
    mask = (jnp.arange(T)[:, None] < n_valid_t).astype(jnp.float32)
    return jnp.broadcast_to(mask, (T, B)).reshape(-1)


def _masked_mean(vals, mask):
    """Mean of per-row cost values, excluding bucket-padding rows.

    The reference pads each batch only to its own max sentence length and
    includes every (T_max, B) frame in the loss (zero-padding quirk,
    core.py:581-598); bucketed T padding would add up to ~30-50% extra
    label-0 frames on top, biasing gradients toward class 0 and inflating
    the err metric that drives new-bob lr halving.  Masking rows with
    t >= n_valid_t (the unbucketed batch max) restores the reference's
    exact averaging while keeping shapes static for XLA.  `mask` is None
    (or shape-mismatched, e.g. a frame-level batch) -> plain mean.
    """
    vals = vals.astype(jnp.float32)  # cost sums stay f32 under bf16 compute
    if mask is None or vals.shape[0] != mask.shape[0]:
        return vals.mean()
    return (vals * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def apply_graph(
    graph: GraphSpec,
    params: Dict,
    batch_stats: Dict,
    feats: jnp.ndarray,
    labs: Optional[jnp.ndarray],
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
    to_do: str = "train",
    lengths: Optional[jnp.ndarray] = None,
    n_valid_t: Optional[jnp.ndarray] = None,
) -> Tuple[Dict[str, jnp.ndarray], Dict]:
    """Execute the compiled program.  Returns (outs, new_batch_stats).

    `to_do='forward'` stops after the last forward_out and skips costs
    (reference core.py:616-629 / utils.py:2341-2342).
    `n_valid_t` (scalar, traced) is the unbucketed batch-max length on the
    cost time axis; cost rows at t >= n_valid_t are bucket padding and are
    masked out of the cost means (see `_masked_mean`).
    """
    outs = _feature_slices(graph, feats)
    new_stats = dict(batch_stats)
    # forward mode stops once every requested output exists; tracked as a
    # set because the cfg's forward_out order need not match program order
    # (stopping at forward_outs[-1] would skip outs computed later in the
    # program than the list's last element).  Outputs already materialized
    # as raw feature slices are drained up front, and skipped cost ops
    # drain too — otherwise a slice/cost forward_out would leave the set
    # non-empty forever and the whole program would run with no early stop
    if to_do == "forward":
        pending_fwd = set(graph.forward_outs) - set(outs)
        if not pending_fwd:
            return outs, new_stats
    else:
        pending_fwd = set()

    def _drained(name):
        pending_fwd.discard(name)
        return not pending_fwd

    # bucket-padding cost masks: label-rate rows for nll/err, feature-rate
    # rows for mse; selected per-cost by flattened-row-count match
    lab_mask = (
        _row_mask(labs, n_valid_t)
        if n_valid_t is not None and labs is not None and labs.ndim == 3
        else None
    )
    # n_valid_t counts LABEL-rate frames, so a feature-rate mask is only
    # meaningful when the feature time axis runs at the same rate (raw-wave
    # batches have T_samples >> T_lab; masking their first n_valid_t sample
    # rows would silently drop ~(1 - 1/window_shift) of the valid signal
    # from an mse cost) — in that case fall back to the unmasked mean, the
    # reference's own zero-pad-inclusive behavior
    fea_mask = (
        _row_mask(feats, n_valid_t)
        if n_valid_t is not None
        and feats.ndim == 3
        and (labs is None or labs.ndim != 3 or labs.shape[0] == feats.shape[0])
        else None
    )

    def get_label(name):
        col = graph.lab_layout[name]
        return labs[..., col].reshape(-1).astype(jnp.int32)

    for s in graph.stmts:
        if s.op == "compute":
            module = graph.modules[s.arg1]
            arch = graph.archs[s.arg1]
            inp = _adapt_for_arch(outs[s.arg2], arch.seq_model, feats)
            variables = {"params": params[s.arg1]}
            has_stats = bool(new_stats.get(s.arg1))
            if has_stats:
                variables["batch_stats"] = new_stats[s.arg1]
            arch_train = train and not arch.freeze
            sub_rngs = None
            if rngs is not None and arch_train:
                import zlib

                fold = zlib.crc32(s.arg1.encode()) & 0x7FFFFFFF
                sub_rngs = {"dropout": jax.random.fold_in(rngs["dropout"], fold)}
            kwargs = {}
            if arch.seq_model and lengths is not None:
                kwargs["lengths"] = lengths
            if has_stats and arch_train:
                out, updates = module.apply(
                    variables, inp, train=True, rngs=sub_rngs,
                    mutable=["batch_stats"], **kwargs,
                )
                new_stats[s.arg1] = updates["batch_stats"]
            else:
                out = module.apply(
                    variables, inp, train=arch_train, rngs=sub_rngs, **kwargs
                )
            outs[s.out] = out
        elif s.op == "cost_nll":
            if to_do == "forward":
                if _drained(s.out):
                    break
                continue
            logp = _flatten_out(outs[s.arg1])
            y = get_label(s.arg2)
            vals = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            outs[s.out] = _masked_mean(vals, lab_mask)
        elif s.op == "cost_err":
            if to_do == "forward":
                if _drained(s.out):
                    break
                continue
            logp = _flatten_out(outs[s.arg1])
            y = get_label(s.arg2)
            pred = jnp.argmax(logp, axis=1)
            vals = (pred != y).astype(jnp.float32)
            outs[s.out] = _masked_mean(vals, lab_mask)
        elif s.op == "concatenate":
            a, b = _harmonize(outs[s.arg1], outs[s.arg2])
            outs[s.out] = jnp.concatenate([a, b], axis=a.ndim - 1)
        elif s.op == "mult":
            a, b = _harmonize(outs[s.arg1], outs[s.arg2])
            outs[s.out] = a * b
        elif s.op == "sum":
            a, b = _harmonize(outs[s.arg1], outs[s.arg2])
            outs[s.out] = a + b
        elif s.op == "avg":
            a, b = _harmonize(outs[s.arg1], outs[s.arg2])
            outs[s.out] = (a + b) / 2
        elif s.op == "mult_constant":
            outs[s.out] = outs[s.arg1] * float(s.arg2)
        elif s.op == "sum_constant":
            outs[s.out] = outs[s.arg1] + float(s.arg2)
        elif s.op == "mse":
            a, b = _harmonize(outs[s.arg1], outs[s.arg2])
            sq = ((a - b).astype(jnp.float32)) ** 2
            if sq.ndim == 3:
                sq = sq.reshape(sq.shape[0] * sq.shape[1], -1)
            vals = sq.mean(axis=1)
            # strict row-count match: a mask built for a different time
            # rate must never be applied; no match -> unmasked mean
            mask = None
            for cand in (fea_mask, lab_mask):
                if cand is not None and vals.shape[0] == cand.shape[0]:
                    mask = cand
                    break
            outs[s.out] = _masked_mean(vals, mask)
        if pending_fwd and _drained(s.out):
            break
    return outs, new_stats
