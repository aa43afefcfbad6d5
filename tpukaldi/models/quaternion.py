"""Quaternion-algebra layers: QuaternionDense + QLSTM.

Semantics follow the reference quaternion_neural_networks.py: weights stored
as 4 real matrices (r,i,j,k); the forward is `x @ K` with K the 4x4 block
Hamilton kernel (:388-405); initialization draws the quaternion modulus
from a chi(4) distribution with a random unit imaginary axis and uniform
phase (`quaternion_init`, :560-626) or unitary/random alternatives.

The reference's `autograd=False` path (:408-477) hand-writes the backward
to avoid materializing gradients of the big concatenated kernel (4x less
VRAM).  Here the same component-space gradients are a `jax.custom_vjp`
(`quaternion_linear_leanvjp`): the backward contracts per-component
(D/4, N) x (N, H/4) matmuls and never forms dK — on TPU this also keeps
each grad matmul MXU-shaped.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import to_bool
from .common import act_fun, float_list, int_list, recurrent_drop_mask
from .recurrent import _reverse_time


def hamilton_kernel(r, i, j, k):
    """(4*Din/4, 4*Dout/4) block kernel such that x @ K == W (*) x
    (Hamilton product), reference layout (:388-392)."""
    col_r = jnp.concatenate([r, -i, -j, -k], axis=0)
    col_i = jnp.concatenate([i, r, -k, j], axis=0)
    col_j = jnp.concatenate([j, k, r, -i], axis=0)
    col_k = jnp.concatenate([k, -j, i, r], axis=0)
    return jnp.concatenate([col_r, col_i, col_j, col_k], axis=1)


@jax.custom_vjp
def quaternion_linear_leanvjp(x, r, i, j, k):
    return x @ hamilton_kernel(r, i, j, k)


def _qfwd(x, r, i, j, k):
    return quaternion_linear_leanvjp(x, r, i, j, k), (x, r, i, j, k)


def _qbwd(res, g):
    x, r, i, j, k = res
    K = hamilton_kernel(r, i, j, k)
    gx = g @ K.T
    n = r.shape[0]
    xs = [x[..., a * n : (a + 1) * n] for a in range(4)]
    m = r.shape[1]
    gs = [g[..., a * m : (a + 1) * m] for a in range(4)]

    def ct(a, b):  # contraction x_comp^T @ g_comp over all leading axes
        return jnp.tensordot(a, b, axes=(tuple(range(a.ndim - 1)),) * 2)

    xr, xi, xj, xk = xs
    gr, gi, gj, gk = gs
    gr_w = ct(xr, gr) + ct(xi, gi) + ct(xj, gj) + ct(xk, gk)
    gi_w = -ct(xi, gr) + ct(xr, gi) - ct(xk, gj) + ct(xj, gk)
    gj_w = -ct(xj, gr) + ct(xk, gi) + ct(xr, gj) - ct(xi, gk)
    gk_w = -ct(xk, gr) - ct(xj, gi) + ct(xi, gj) + ct(xr, gk)
    return gx, gr_w, gi_w, gj_w, gk_w


quaternion_linear_leanvjp.defvjp(_qfwd, _qbwd)


def quaternion_init_arrays(in_features4: int, out_features4: int, seed: int,
                           kind: str = "quaternion", criterion: str = "glorot"):
    """Reference init schemes (:483-626): returns (r, i, j, k) numpy arrays
    of shape (in_features/4, out_features/4)."""
    rng = np.random.RandomState(seed)
    fan_in, fan_out = in_features4, out_features4
    if criterion == "glorot":
        s = 1.0 / np.sqrt(2 * (fan_in + fan_out))
    else:  # he
        s = 1.0 / np.sqrt(2 * fan_in)
    shape = (in_features4, out_features4)
    n = int(np.prod(shape))
    if kind == "random":
        bound = np.sqrt(3.0) * s
        return tuple(
            rng.uniform(-bound, bound, shape) for _ in range(4)
        )
    if kind == "unitary":
        bound = np.sqrt(3.0) * s
        v = [rng.uniform(-bound, bound, n) for _ in range(4)]
        norm = np.sqrt(sum(c**2 for c in v)) + 1e-4
        return tuple((c / norm).reshape(shape) for c in v)
    # 'quaternion': chi(4)-modulus polar init
    modulus = np.sqrt(rng.chisquare(4, n)) * s
    phase = rng.uniform(-np.pi, np.pi, n)
    v = [rng.uniform(0, 1, n) for _ in range(3)]
    vnorm = np.sqrt(sum(c**2 for c in v)) + 1e-4
    vi, vj, vk = (c / vnorm for c in v)
    r = (modulus * np.cos(phase)).reshape(shape)
    i = (modulus * vi * np.sin(phase)).reshape(shape)
    j = (modulus * vj * np.sin(phase)).reshape(shape)
    k = (modulus * vk * np.sin(phase)).reshape(shape)
    return r, i, j, k


def _np_seed_from_rng(module: nn.Module, offset: int) -> int:
    """Derive a numpy RandomState seed from the module's flax 'params' RNG
    (concrete during eager init) plus a structural offset.  Outside
    initialization the value is never used (params already exist)."""
    if not module.is_initializing():
        return offset
    key = jax.random.fold_in(module.make_rng("params"), offset)
    data = np.asarray(jax.random.key_data(key)).ravel()
    return int(data[-1]) & 0x7FFFFFFF


class QuaternionDense(nn.Module):
    """Quaternion linear layer; features must be divisible by 4."""

    features: int
    use_bias: bool = True
    weight_init: str = "quaternion"
    lean_vjp: bool = False
    seed: int = 0

    @nn.compact
    def __call__(self, x):
        din, dout = x.shape[-1], self.features
        if din % 4 or dout % 4:
            raise ValueError(
                f"quaternion dims must be multiples of 4, got {din}->{dout}"
            )

        # the numpy RandomState seed derives from the flax init RNG (i.e.
        # the experiment seed), folded with self.seed for per-gate
        # distinctness — a fixed literal seed would make every run and
        # every same-shape instance bit-identical.  One seed is drawn per
        # module call so the r/i/j/k components share the chi-modulus draw.
        np_seed = _np_seed_from_rng(self, self.seed)

        def make(name, idx):
            def init(key, shape):
                arrays = quaternion_init_arrays(
                    din // 4, dout // 4, np_seed, self.weight_init
                )
                return jnp.asarray(arrays[idx], dtype=jnp.float32)

            return self.param(name, init, (din // 4, dout // 4))

        r, i, j, k = (make(n, a) for a, n in enumerate("rijk"))
        if self.lean_vjp:
            y = quaternion_linear_leanvjp(x, r, i, j, k)
        else:
            y = x @ hamilton_kernel(r, i, j, k)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (dout,))
            y = y + b
        return y


class QLSTM(nn.Module):
    """Quaternion LSTM (reference quaternion_neural_networks.py:21-168):
    per-gate quaternion projections, bidir via flip-concat, drop mask on the
    cell candidate.  Options use the reference's `lstm_*` keys plus
    `quaternion_init` and `autograd` (False -> lean custom VJP)."""

    options: Dict[str, Any]
    inp_dim: int

    @classmethod
    def compute_out_dim(cls, options, inp_dim) -> int:
        lay = int_list(options["lstm_lay"])
        bidir = to_bool(options["lstm_bidir"])
        return lay[-1] * (2 if bidir else 1)

    @property
    def out_dim(self) -> int:
        return self.compute_out_dim(self.options, self.inp_dim)

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        o = self.options
        lay = int_list(o["lstm_lay"])
        drop = float_list(o["lstm_drop"])
        acts = o["lstm_act"].split(",")
        bidir = to_bool(o["lstm_bidir"])
        winit = o.get("quaternion_init", "quaternion")
        lean = not to_bool(o.get("autograd", "True"))

        for i, hidden in enumerate(lay):
            T, B, D = x.shape
            if bidir:
                x = jnp.concatenate([x, _reverse_time(x, lengths)], axis=1)
            Bp = x.shape[1]
            act = act_fun(acts[i])
            # mask in the compute dtype so the scan carry stays uniform
            # under the bf16 compute mode
            drop_mask = recurrent_drop_mask(
                self, train, (Bp, hidden), drop[i]
            ).astype(x.dtype)

            gates = {}
            for gate in "fioc":
                gates[gate] = QuaternionDense(
                    hidden, use_bias=True, weight_init=winit, lean_vjp=lean,
                    seed=i * 8 + "fioc".index(gate), name=f"w{gate}x{i}",
                )(x)

            # recurrent quaternion weights as raw params, fused into one
            # (H, 4H) Hamilton kernel so the scan body is a single matmul
            def rec_init(gate_idx):
                # seed from the experiment RNG (see _np_seed_from_rng), the
                # structural offset keeps per-gate/per-layer distinctness
                np_seed = _np_seed_from_rng(self, i * 8 + 4 + gate_idx)

                def init(key, shape):
                    arrays = quaternion_init_arrays(
                        hidden // 4, hidden // 4, np_seed, winit
                    )
                    return jnp.stack(
                        [jnp.asarray(a, jnp.float32) for a in arrays]
                    )

                return init

            kernels = []
            for gi_, gate in enumerate("fioc"):
                w = self.param(
                    f"u{gate}h{i}", rec_init(gi_), (4, hidden // 4, hidden // 4)
                )
                kernels.append(hamilton_kernel(w[0], w[1], w[2], w[3]))
            u_all = jnp.concatenate(kernels, axis=1)  # (H, 4H)
            from ..kernels._common import record_dispatch
            from ..kernels.lstm import lean_fits_vmem, lstm_recurrence_lean

            # Once composed, the Hamilton-dense recurrence IS the zoo LSTM
            # cell (f,i,o,c gate order, drop mask on the candidate —
            # reference quaternion_neural_networks.py:120-141), so the
            # tanh case rides the resident-bf16-U fused Pallas kernel: the
            # f32 U at recipe H=1024 is 16 MB — past the VMEM core — but
            # bf16 U (8 MB, the same products XLA's DEFAULT matmul
            # precision multiplies anyway) stays resident, removing the
            # 16 MB x T x lay HBM weight re-read that floored the scan at
            # the v5e bandwidth (measured 43.5 ms/step f32 = the 819 GB/s
            # floor exactly; see kernels/lstm.py lean section).
            impl = o.get("qlstm_impl", "auto")
            on_tpu = jax.default_backend() == "tpu"
            use_fused = (
                impl != "scan"
                and acts[i] == "tanh"
                and lean_fits_vmem(Bp, hidden)
                and (on_tpu or impl == "pallas")
            )
            if use_fused:
                record_dispatch("qlstm", "fused_pallas_leanu", Bp, hidden)
                ff = jnp.concatenate(
                    [gates[g] for g in "fioc"], axis=2
                )  # (T, Bp, 4H)
                mask2d = jnp.broadcast_to(
                    drop_mask.astype(jnp.float32), (Bp, hidden)
                )
                h = lstm_recurrence_lean(
                    ff, u_all, mask2d, not on_tpu
                ).astype(x.dtype)
                if bidir:
                    h_f = h[:, : Bp // 2]
                    h_b = _reverse_time(h[:, Bp // 2 :], lengths)
                    h = jnp.concatenate([h_f, h_b], axis=2)
                x = h
                continue
            record_dispatch("qlstm", "lax_scan_hamilton", Bp, hidden)

            def step(state, g_t, u_all=u_all, act=act, drop_mask=drop_mask,
                     hidden=hidden):
                h, c = state
                gf, gi_, go, gc = g_t
                r = h @ u_all
                rf, ri, ro, rc = (
                    r[:, a * hidden : (a + 1) * hidden] for a in range(4)
                )
                ft = jax.nn.sigmoid(gf + rf)
                it = jax.nn.sigmoid(gi_ + ri)
                ot = jax.nn.sigmoid(go + ro)
                c = it * act(gc + rc) * drop_mask + ft * c
                h = ot * act(c)
                return (h, c), h

            z = jnp.zeros((Bp, hidden), dtype=x.dtype)
            # TPUKALDI_QLSTM_UNROLL: measured at recipe shapes (T=500,
            # B=16, H=1024): unroll=4 gains +4.9% in f32 but LOSES 9% in
            # the bf16 compute mode and unroll=8 loses everywhere
            # (VMEM/register pressure around the 4H-wide gate block), so
            # the default stays 1; the knob remains for A/B
            import os as _os

            _unroll = int(_os.environ.get("TPUKALDI_QLSTM_UNROLL", "1"))
            _, h = jax.lax.scan(
                step, (z, z),
                (gates["f"], gates["i"], gates["o"], gates["c"]),
                unroll=_unroll,
            )
            if bidir:
                h_f = h[:, : Bp // 2]
                h_b = _reverse_time(h[:, Bp // 2 :], lengths)
                h = jnp.concatenate([h_f, h_b], axis=2)
            x = h
        return x
