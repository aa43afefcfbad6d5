"""Per-architecture optimizers (optax), matching the reference's torch
optimizer semantics (utils.py:2106-2164 `optimizer_init`):

- one independent optimizer per architecture section, all stepped together
  on loss_final's gradient, with per-arch freeze flags (core.py:631-642);
- sgd with momentum/dampening/nesterov/weight-decay, adam with
  betas/eps/amsgrad/L2, rmsprop with alpha/momentum/centered/L2
  (torch-style coupled L2 weight decay = gradient + wd*param);
- learning rate injected per step so new-bob annealing (run_exp.py:374-384)
  changes lr without touching optimizer state.
"""

from __future__ import annotations

from typing import Any, Dict

import optax

from ..config.cfg import ArchSpec


def _torch_sgd(momentum, dampening, nesterov):
    if momentum == 0.0:
        return optax.identity()
    return optax.trace(decay=momentum, nesterov=nesterov, accumulator_dtype=None)


def make_optimizer(arch: ArchSpec) -> optax.GradientTransformation:
    """Build the optax chain for one architecture.  The chain ends with
    `scale_by_learning_rate` fed from an injected hyperparam `lr`."""
    kind = arch.optimizer.kind
    o = arch.optimizer.options
    wd = float(o.get("opt_weight_decay", 0.0))
    parts = []
    # optional global-norm gradient clipping (the reference carries this
    # commented out at core.py:636-638 with threshold 0.1; opt-in here via
    # the arch_grad_clip extension field)
    clip = float(arch.options.get("arch_grad_clip", 0.0) or 0.0)
    if clip > 0.0:
        parts.append(optax.clip_by_global_norm(clip))
    if wd > 0.0:
        parts.append(optax.add_decayed_weights(wd))  # torch coupled L2
    if kind == "sgd":
        momentum = float(o.get("opt_momentum", 0.0))
        nesterov = bool(o.get("opt_nesterov", False))
        dampening = float(o.get("opt_dampening", 0.0))
        # torch dampening only affects momentum accumulation; optax trace
        # has no dampening — refuse rather than silently training with
        # different momentum math (reference cfgs all use dampening 0)
        if momentum != 0.0 and dampening != 0.0:
            raise ValueError(
                f"arch {arch.name!r}: opt_dampening={dampening} is "
                "unsupported (momentum dampening has no optax equivalent); "
                "use opt_dampening=0"
            )
        parts.append(_torch_sgd(momentum, dampening, nesterov))
    elif kind == "adam":
        betas = o.get("opt_betas", [0.9, 0.999])
        parts.append(
            optax.scale_by_adam(
                b1=float(betas[0]),
                b2=float(betas[1]),
                eps=float(o.get("opt_eps", 1e-8)),
            )
            if not bool(o.get("opt_amsgrad", False))
            else optax.scale_by_amsgrad(
                b1=float(betas[0]),
                b2=float(betas[1]),
                eps=float(o.get("opt_eps", 1e-8)),
            )
        )
    elif kind == "rmsprop":
        # eps_in_sqrt=False reproduces torch RMSprop's g/(sqrt(v)+eps)
        # placement (optax default computes g/sqrt(v+eps), which diverges
        # up to ~10x on small-gradient coordinates while v is near zero)
        parts.append(
            optax.scale_by_rms(
                decay=float(o.get("opt_alpha", 0.99)),
                eps=float(o.get("opt_eps", 1e-8)),
                eps_in_sqrt=False,
            )
            if not bool(o.get("opt_centered", False))
            else optax.scale_by_stddev(
                decay=float(o.get("opt_alpha", 0.99)),
                eps=float(o.get("opt_eps", 1e-8)),
                eps_in_sqrt=False,
            )
        )
        momentum = float(o.get("opt_momentum", 0.0))
        if momentum > 0.0:
            parts.append(optax.trace(decay=momentum, nesterov=False))
    elif kind == "none":
        # refac01's arch_opt=none (proto/global_refac01.proto:47): the net
        # gets no optimizer update at all — the reference simply never
        # registers it in optimizer_init (utils.py:2114-2146).  Zero updates
        # keep the uniform per-arch step structure (and set_lr stays valid).
        parts.append(optax.set_to_zero())
    else:
        raise ValueError(f"unknown optimizer {kind!r}")

    return optax.inject_hyperparams(
        lambda lr: optax.chain(*parts, optax.scale(-lr))
    )(lr=arch.lr[0])


def make_all_optimizers(
    archs: Dict[str, ArchSpec]
) -> Dict[str, optax.GradientTransformation]:
    return {name: make_optimizer(a) for name, a in archs.items()}


def init_opt_states(optimizers, params) -> Dict[str, Any]:
    return {name: optimizers[name].init(params[name]) for name in params}


def set_lr(opt_state, lr):
    """Functionally replace the injected lr in an inject_hyperparams state."""
    import jax.numpy as jnp

    new_hp = dict(opt_state.hyperparams)
    new_hp["lr"] = jnp.asarray(lr, dtype=jnp.asarray(new_hp["lr"]).dtype)
    return opt_state._replace(hyperparams=new_hp)
