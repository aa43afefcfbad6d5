"""Recurrent model zoo: RNN, GRU, minimalGRU, Li-GRU, LSTM.

Cell semantics match the reference exactly (neural_networks.py:300-485 LSTM,
:486-655 GRU, :997-1155 liGRU, :1158-1317 minimalGRU, :1319-1461 RNN):

- feed-forward gate projections hoisted out of the time loop and computed as
  ONE fused (T*B, D) @ (D, G*H) matmul per layer (MXU-shaped);
- optional batchnorm over the (T*B) flattening of each gate's feed-forward
  path (train-mode stats computed before the recurrence — reference
  semantics preserved);
- the time recurrence as `lax.scan` with a single fused (B, H) @ (H, G*H)
  recurrent matmul per step;
- bidirectionality by batch-doubling with the time-flipped copy, split and
  re-flipped after the scan (the reference's flip-concat trick, which keeps
  the MXU busy on 2B rows instead of running two scans);
- recurrent dropout as one Bernoulli mask shared across time (train) or the
  scalar (1-p) (eval) — NOT inverted dropout, preserved for parity;
- optional reference-style LayerNorm applied to h inside the recurrence.

Tensor contract: x is (T, B, D) -> (T, B, out_dim).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import to_bool
from .common import (
    act_fun,
    bool_list,
    float_list,
    int_list,
    make_batchnorm,
    orthogonal_init,
    recurrent_drop_mask,
    torch_linear_uniform,
)


from .common import ref_laynorm as _ref_laynorm  # shared f32-moment formula


def _reverse_time(x, lengths):
    """Time-reverse (T, B, D), respecting per-sequence valid lengths when
    given (sequences padded at the END).  With lengths=None this is a plain
    flip (the reference's `flip`, neural_networks.py:1962).  The function is
    an involution, so it also un-reverses scan outputs.

    Length-aware reversal is what makes bucket-padded forward mode exact for
    bidirectional models: valid frames are reversed among themselves and
    trailing padding stays in place (SURVEY.md §7.4 item 3)."""
    if lengths is None:
        return jnp.flip(x, axis=0)
    T = x.shape[0]
    t = jnp.arange(T)[:, None]
    idx = jnp.where(t < lengths[None, :], lengths[None, :] - 1 - t, t)
    return jnp.take_along_axis(x, idx[:, :, None], axis=0)


class _RecurrentBase(nn.Module):
    """Shared scaffold; subclasses define PREFIX, FF_GATES, REC_GATES and
    a `step` building the per-timestep update."""

    options: Dict[str, Any]
    inp_dim: int

    PREFIX = ""
    FF_GATES = ()  # plain class attrs (no annotation: not dataclass fields)
    REC_GATES = ()

    @classmethod
    def compute_out_dim(cls, options: Dict[str, str], inp_dim: int) -> int:
        lay = int_list(options[f"{cls.PREFIX}_lay"])
        bidir = to_bool(options[f"{cls.PREFIX}_bidir"])
        return lay[-1] * (2 if bidir else 1)

    @property
    def out_dim(self) -> int:
        return self.compute_out_dim(self.options, self.inp_dim)

    # -- per-cell recurrence hooks -----------------------------------------
    def init_state(self, batch: int, hidden: int):
        return jnp.zeros((batch, hidden), dtype=jnp.float32)

    def extra_params(self, i: int, hidden: int, orthinit: bool) -> Dict[str, Any]:
        """Per-layer params outside the fused recurrent matmul (e.g. the
        GRU candidate matrix applied to rt*h)."""
        return {}

    def step(self, state, ff_t, rec, extras, act, drop_mask):
        raise NotImplementedError

    def maybe_fused(self, i, ff, u, extras, act_name, use_ln, drop_mask, train):
        """Hook: return the full (T, B, H) hidden sequence from a fused
        (Pallas) recurrence kernel, or None to use the generic scan."""
        return None

    @staticmethod
    def _kernel_fits_vmem(ff, u, time_block=16, budget=12 * 2**20):
        """The fused kernels keep U + pipelined ff/out blocks resident in
        VMEM (~16 MB/core); fall back to lax.scan when they would not fit
        (e.g. H=1024 LSTM has a 16.8 MB U alone)."""
        B = ff.shape[1]
        H = u.shape[0]
        u_bytes = u.size * 4
        blk = time_block * B * (ff.shape[2] + H) * 4 * 2  # double-buffered
        return u_bytes + blk + B * H * 4 * 3 < budget

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        o = self.options
        p = self.PREFIX
        lay = int_list(o[f"{p}_lay"])
        drop = float_list(o[f"{p}_drop"])
        use_bn = bool_list(o[f"{p}_use_batchnorm"])
        use_ln = bool_list(o[f"{p}_use_laynorm"])
        acts = o[f"{p}_act"].split(",")
        bidir = to_bool(o[f"{p}_bidir"])
        orthinit = to_bool(o.get(f"{p}_orthinit", "True"))

        if to_bool(o.get(f"{p}_use_laynorm_inp", "False")):
            gamma = self.param("ln_inp_gamma", nn.initializers.ones, (self.inp_dim,))
            beta = self.param("ln_inp_beta", nn.initializers.zeros, (self.inp_dim,))
            x = _ref_laynorm(x, gamma, beta)
        if to_bool(o.get(f"{p}_use_batchnorm_inp", "False")):
            T0, B0, D0 = x.shape
            x = make_batchnorm(not train, name="bn_inp")(x.reshape(T0 * B0, D0))
            x = x.reshape(T0, B0, D0)

        n_ff = len(self.FF_GATES)

        for i, hidden in enumerate(lay):
            T, B, D = x.shape
            if bidir:
                x = jnp.concatenate([x, _reverse_time(x, lengths)], axis=1)
            Bp = x.shape[1]
            use_bias = not (use_ln[i] or use_bn[i])

            # fused feed-forward gate projection: one MXU matmul for all gates
            w = jnp.concatenate(
                [
                    self.param(f"w{g}{i}", torch_linear_uniform(D), (D, hidden))
                    for g in self.FF_GATES
                ],
                axis=1,
            )
            ff = x.reshape(T * Bp, D) @ w
            if use_bias:
                b = jnp.concatenate(
                    [
                        self.param(
                            f"b{g}{i}", torch_linear_uniform(D), (hidden,)
                        )
                        for g in self.FF_GATES
                    ]
                )
                ff = ff + b
            if use_bn[i]:
                # per-feature BN over (T*B') == the reference's per-gate BNs
                ff = make_batchnorm(not train, name=f"bn_ff{i}")(ff)
            ff = ff.reshape(T, Bp, n_ff * hidden)

            # fused recurrent weights (orthogonal per gate block)
            u = jnp.concatenate(
                [
                    self.param(
                        f"u{g}{i}",
                        orthogonal_init() if orthinit else torch_linear_uniform(hidden),
                        (hidden, hidden),
                    )
                    for g in self.REC_GATES
                ],
                axis=1,
            )

            extras = self.extra_params(i, hidden, orthinit)
            # mask in the layer's compute dtype so the scan body does not
            # promote back to f32 under the bf16 compute mode (the pallas
            # kernels cast their own inputs)
            drop_mask = recurrent_drop_mask(
                self, train, (Bp, hidden), drop[i]
            ).astype(ff.dtype)

            h = self.maybe_fused(
                i, ff, u, extras, acts[i], use_ln[i], drop_mask, train
            )
            if h is not None:
                # the pallas kernels compute/return f32; stay in the layer's
                # compute dtype downstream (bf16 mode)
                h = h.astype(ff.dtype)
                if bidir:
                    h_f = h[:, : Bp // 2]
                    h_b = _reverse_time(h[:, Bp // 2 :], lengths)
                    h = jnp.concatenate([h_f, h_b], axis=2)
                x = h
                continue

            act = act_fun(acts[i])
            if use_ln[i]:
                ln_gamma = self.param(f"ln{i}_gamma", nn.initializers.ones, (hidden,))
                ln_beta = self.param(f"ln{i}_beta", nn.initializers.zeros, (hidden,))
                ln = lambda h: _ref_laynorm(h, ln_gamma, ln_beta)
            else:
                ln = lambda h: h

            def scan_step(state, ff_t, u=u, extras=extras, act=act,
                          drop_mask=drop_mask, ln=ln):
                state, out = self.step(
                    state,
                    ff_t,
                    lambda h: h @ u,  # fused (B,H)@(H,n_rec*H)
                    extras,
                    act,
                    drop_mask,
                )
                out = ln(out)
                state = self.replace_output(state, out)
                return state, out

            # carry the recurrence in the layer's compute dtype (a f32
            # state would promote every scan-step op back to f32 under
            # the bf16 compute mode)
            state0 = jax.tree_util.tree_map(
                lambda s: s.astype(ff.dtype), self.init_state(Bp, hidden)
            )

            def run_scan(state0, ff):
                return jax.lax.scan(scan_step, state0, ff)

            if to_bool(o.get(f"{p}_remat", "False")):
                # rematerialize the recurrence on backward: drops per-step
                # gate residuals from memory at the cost of a second forward
                # (jax.checkpoint; useful for deep stacks on long sequences)
                run_scan = jax.checkpoint(run_scan)
            _, h = run_scan(state0, ff)

            if bidir:
                h_f = h[:, : Bp // 2]
                h_b = _reverse_time(h[:, Bp // 2 :], lengths)
                h = jnp.concatenate([h_f, h_b], axis=2)
            x = h
        return x

    def replace_output(self, state, out):
        """Write the (possibly laynormed) h back into the carried state."""
        return out


def _split_gates(ff_t, n, hidden):
    return [ff_t[..., k * hidden : (k + 1) * hidden] for k in range(n)]


class liGRU(_RecurrentBase):
    """Light GRU (the flagship cell): single update gate, ReLU candidate,
    batchnorm on the feed-forward path (neural_networks.py:1130-1141)."""

    PREFIX = "ligru"
    FF_GATES = ("h", "z")
    REC_GATES = ("h", "z")

    def maybe_fused(self, i, ff, u, extras, act_name, use_ln, drop_mask, train):
        """Route the relu/no-laynorm case through the fused Pallas kernel
        (tpukaldi.kernels.ligru).  `ligru_impl` option: auto (pallas on TPU,
        scan elsewhere) | pallas (forced; interpret-mode off-TPU) | scan."""
        impl = self.options.get("ligru_impl", "auto")
        if impl == "scan" or act_name != "relu" or use_ln:
            return None
        if not self._kernel_fits_vmem(ff, u):
            return None
        on_tpu = jax.default_backend() == "tpu"
        if impl == "auto" and not on_tpu:
            return None
        from ..kernels.ligru import ligru_recurrence

        mask = jnp.broadcast_to(drop_mask, (ff.shape[1], ff.shape[2] // 2))
        return ligru_recurrence(ff, u, mask, not on_tpu)

    def step(self, h, ff_t, rec, extras, act, drop_mask):
        hidden = h.shape[-1]
        wh_t, wz_t = _split_gates(ff_t, 2, hidden)
        uh_h, uz_h = _split_gates(rec(h), 2, hidden)
        zt = jax.nn.sigmoid(wz_t + uz_h)
        hcand = act(wh_t + uh_h) * drop_mask
        ht = zt * h + (1 - zt) * hcand
        return ht, ht


class GRU(_RecurrentBase):
    """Standard GRU with reset gate (neural_networks.py:629-641).
    The candidate matmul acts on rt*h so it cannot join the fused recurrent
    matmul; it lives in `extras`."""

    PREFIX = "gru"
    FF_GATES = ("h", "z", "r")
    REC_GATES = ("z", "r")

    def maybe_fused(self, i, ff, u, extras, act_name, use_ln, drop_mask, train):
        """Fused Pallas GRU (gru_impl = auto|pallas|scan)."""
        impl = self.options.get("gru_impl", "auto")
        if impl == "scan" or act_name not in ("relu", "tanh") or use_ln:
            return None
        if not self._kernel_fits_vmem(ff, u):
            return None
        on_tpu = jax.default_backend() == "tpu"
        if impl == "auto" and not on_tpu:
            return None
        from ..kernels.gru import gru_recurrence

        mask = jnp.broadcast_to(drop_mask, (ff.shape[1], ff.shape[2] // 3))
        return gru_recurrence(ff, u, extras["uh"], mask, act_name, not on_tpu)

    def extra_params(self, i, hidden, orthinit):
        return {
            "uh": self.param(
                f"uh{i}",
                orthogonal_init() if orthinit else torch_linear_uniform(hidden),
                (hidden, hidden),
            )
        }

    def step(self, h, ff_t, rec, extras, act, drop_mask):
        hidden = h.shape[-1]
        wh_t, wz_t, wr_t = _split_gates(ff_t, 3, hidden)
        uz_h, ur_h = _split_gates(rec(h), 2, hidden)
        zt = jax.nn.sigmoid(wz_t + uz_h)
        rt = jax.nn.sigmoid(wr_t + ur_h)
        at = wh_t + (rt * h) @ extras["uh"]
        hcand = act(at) * drop_mask
        ht = zt * h + (1 - zt) * hcand
        return ht, ht


class minimalGRU(_RecurrentBase):
    """Minimal GRU: the gate multiplies the state inside the candidate
    (neural_networks.py:1291-1297)."""

    PREFIX = "minimalgru"
    FF_GATES = ("h", "z")
    REC_GATES = ("z",)

    def extra_params(self, i, hidden, orthinit):
        return {
            "uh": self.param(
                f"uh{i}",
                orthogonal_init() if orthinit else torch_linear_uniform(hidden),
                (hidden, hidden),
            )
        }

    def step(self, h, ff_t, rec, extras, act, drop_mask):
        hidden = h.shape[-1]
        wh_t, wz_t = _split_gates(ff_t, 2, hidden)
        (uz_h,) = _split_gates(rec(h), 1, hidden)
        zt = jax.nn.sigmoid(wz_t + uz_h)
        at = wh_t + (zt * h) @ extras["uh"]
        hcand = act(at) * drop_mask
        ht = zt * h + (1 - zt) * hcand
        return ht, ht


class RNN(_RecurrentBase):
    """Vanilla recurrence (neural_networks.py:1438-1447)."""

    PREFIX = "rnn"
    FF_GATES = ("h",)
    REC_GATES = ("h",)

    def step(self, h, ff_t, rec, extras, act, drop_mask):
        hidden = h.shape[-1]
        (wh_t,) = _split_gates(ff_t, 1, hidden)
        (uh_h,) = _split_gates(rec(h), 1, hidden)
        ht = act(wh_t + uh_h) * drop_mask
        return ht, ht


class LSTM(_RecurrentBase):
    """LSTM with the reference's drop-mask-on-candidate convention
    (neural_networks.py:457-469)."""

    PREFIX = "lstm"
    FF_GATES = ("f", "i", "o", "c")
    REC_GATES = ("f", "i", "o", "c")

    def maybe_fused(self, i, ff, u, extras, act_name, use_ln, drop_mask, train):
        """Fused Pallas LSTM for the tanh/no-laynorm case
        (lstm_impl = auto|pallas|scan, like the liGRU)."""
        impl = self.options.get("lstm_impl", "auto")
        if impl == "scan" or act_name != "tanh" or use_ln:
            return None
        on_tpu = jax.default_backend() == "tpu"
        if impl == "auto" and not on_tpu:
            return None
        mask = jnp.broadcast_to(drop_mask, (ff.shape[1], ff.shape[2] // 4))
        if self._kernel_fits_vmem(ff, u):
            from ..kernels.lstm import lstm_recurrence

            return lstm_recurrence(ff, u, mask, not on_tpu)
        # large H: the f32 kernel's resident U + dU exceed VMEM, but the
        # resident-bf16-U lean variant (same products as DEFAULT-precision
        # matmuls; dU contracted outside) may still fit — an order of
        # magnitude over the HBM-floored scan (kernels/lstm.py lean notes)
        from ..kernels.lstm import lean_fits_vmem, lstm_recurrence_lean

        if lean_fits_vmem(ff.shape[1], u.shape[0]):
            return lstm_recurrence_lean(ff, u, mask, not on_tpu)
        return None

    def init_state(self, batch, hidden):
        z = jnp.zeros((batch, hidden), dtype=jnp.float32)
        return (z, z)

    def step(self, state, ff_t, rec, extras, act, drop_mask):
        h, c = state
        hidden = h.shape[-1]
        wf_t, wi_t, wo_t, wc_t = _split_gates(ff_t, 4, hidden)
        uf_h, ui_h, uo_h, uc_h = _split_gates(rec(h), 4, hidden)
        ft = jax.nn.sigmoid(wf_t + uf_h)
        it = jax.nn.sigmoid(wi_t + ui_h)
        ot = jax.nn.sigmoid(wo_t + uo_h)
        ct = it * act(wc_t + uc_h) * drop_mask + ft * c
        ht = ot * act(ct)
        return (ht, ct), ht

    def replace_output(self, state, out):
        _, c = state
        return (out, c)
