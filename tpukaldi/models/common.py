"""Shared building blocks for the model zoo.

Semantics follow the reference's building blocks (neural_networks.py:23-57):
- `act_fun`: relu/tanh/sigmoid/leaky_relu/elu/log-softmax/linear factory
- `RefLayerNorm`: gamma*(x-mean)/(std+eps)+beta with the reference's
  *std* (unbiased, not sqrt(var+eps)) normalization quirk
- batchnorm with torch momentum 0.05 (flax momentum 0.95), eps 1e-5
- uniform +-sqrt(0.01/(fan_in+fan_out)) feed-forward init, orthogonal
  recurrent init
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import to_bool


def act_fun(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "relu":
        return jax.nn.relu
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "elu":
        return jax.nn.elu
    if name == "softmax":
        # always log-normalize in f32: under the bf16 compute mode the
        # logits arrive half-precision, and the log-probabilities feed the
        # NLL cost and the posterior arks — both need full precision
        return lambda x: jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)
    if name == "linear":
        return lambda x: x
    raise ValueError(f"unknown activation {name!r}")


def bool_list(value: str):
    return [to_bool(v) for v in value.split(",")]


def int_list(value: str):
    return [int(v) for v in value.split(",")]


def float_list(value: str):
    return [float(v) for v in value.split(",")]


def glorot_small_uniform(fan_in: int, fan_out: int):
    """Reference MLP init: U(+-sqrt(0.01/(fan_in+fan_out)))
    (neural_networks.py:114-119)."""
    bound = (0.01 / (fan_in + fan_out)) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_uniform(fan_in: int):
    """PyTorch nn.Linear default init: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def orthogonal_init():
    return nn.initializers.orthogonal()


def ref_laynorm(x, gamma, beta, eps=1e-6):
    """The reference's LayerNorm formula (neural_networks.py:23-33):
    normalize over the LAST axis by the *unbiased std* with eps added to
    the std, not the variance.  Moments accumulate in f32 regardless of
    the compute dtype (bf16 mean/var over hundreds of features loses ~3
    digits); the result returns in the caller's dtype.  gamma/beta may be
    (features,) or any shape broadcastable against x (the CNN variant uses
    a full (filt, time) affine map)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum((xf - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    y = gamma.astype(jnp.float32) * (xf - mean) / (jnp.sqrt(var) + eps)
    return (y + beta.astype(jnp.float32)).astype(x.dtype)


class RefLayerNorm(nn.Module):
    """Reference LayerNorm (neural_networks.py:23-33): normalizes by the
    unbiased std with eps *added to std*, not to variance."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        return ref_laynorm(x, gamma, beta, self.eps)


class _F32BatchNorm(nn.BatchNorm):
    """BatchNorm whose statistics always accumulate in f32: under the bf16
    compute mode the (T*B)-sized batch moments would otherwise sum in bf16
    (unusable past ~256 addends) and corrupt the RUNNING stats that
    inference depends on.  The output returns in the caller's dtype."""

    def __call__(self, x, *a, **k):
        return super().__call__(x.astype(jnp.float32), *a, **k).astype(x.dtype)


def make_batchnorm(use_running_average: bool, name: str = None) -> nn.BatchNorm:
    """Torch BatchNorm1d(momentum=0.05) equivalent."""
    return _F32BatchNorm(
        use_running_average=use_running_average,
        momentum=0.95,
        epsilon=1e-5,
        name=name,
    )


class FastDropout(nn.Module):
    """Inverted dropout with 16-bit threshold masks: one threefry word
    yields TWO mask elements (u32 split into u16 halves, assigned to the
    two halves of the largest even axis so the random-bits tensor keeps
    full vreg lane occupancy).  This halves the PRNG cost, which
    dominates big-activation dropout on TPU — XLA runs threefry once in
    the forward fusion and REMATERIALIZES it in the backward, so at the
    TIMIT_SincNet_raw layer-0 activation (16.7M elements) mask
    generation alone was ~0.6 ms/step of VPU work (round-4 device
    trace).  The mask distribution is unchanged (i.i.d. Bernoulli per
    element); keep-probability is quantized to 1/65536 (|bias| <= 8e-6).
    TPUKALDI_DROPOUT_BITS=0 restores flax nn.Dropout (A/B knob); tensors
    with no even axis fall back too.  Replaces nn.Dropout at the zoo's
    per-element dropout sites (reference semantics: torch nn.Dropout,
    identity at eval — neural_networks.py:136-141)."""

    rate: float
    deterministic: bool

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        import os

        keep = 1.0 - self.rate
        # largest even axis, preferring trailing dims (better layouts)
        axis = None
        best = 1
        for a in range(x.ndim - 1, -1, -1):
            if x.shape[a] % 2 == 0 and x.shape[a] > best:
                axis, best = a, x.shape[a]
        key = self.make_rng("dropout")
        if axis is None or os.environ.get("TPUKALDI_DROPOUT_BITS", "1") == "0":
            mask = jax.random.bernoulli(key, keep, x.shape)
        else:
            half_shape = tuple(
                d // 2 if a == axis else d for a, d in enumerate(x.shape)
            )
            ti = int(round(keep * 65536.0))
            if ti >= 65536:
                # rate below the 1/65536 quantum: exact no-op (clamping to
                # 65535 would still drop ~1/65536 of elements — ADVICE r4)
                return x
            bits = jax.random.bits(key, half_shape, jnp.uint32)
            t = jnp.uint32(ti)
            mask = jnp.concatenate(
                [(bits & jnp.uint32(0xFFFF)) < t, (bits >> 16) < t],
                axis=axis,
            )
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def recurrent_drop_mask(module: nn.Module, train: bool, shape, p: float):
    """The recurrent zoo's dropout convention (neural_networks.py:421-425):
    one Bernoulli(1-p) mask reused across time at train, the scalar (1-p)
    at eval.  (Not inverted dropout — preserved for parity.)"""
    if train and p > 0.0:
        key = module.make_rng("dropout")
        return jax.random.bernoulli(key, 1.0 - p, shape).astype(jnp.float32)
    return jnp.asarray(1.0 - p, dtype=jnp.float32)
