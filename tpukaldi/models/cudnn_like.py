"""Standard stacked RNNs — the `*_cudnn` wrapper family.

The reference's LSTM_cudnn/GRU_cudnn/RNN_cudnn (neural_networks.py:153-298)
are thin wrappers over torch's fused cuDNN RNNs: textbook cell equations,
input+recurrent biases, uniform(+-1/sqrt(H)) init, orthogonal hh init, true
per-layer bidirectionality.  Here they use the same hoisted-ff + lax.scan
machinery as the custom zoo but with standard formulations; options follow
proto/{LSTM,GRU,RNN}_cudnn.proto (hidden_size, num_layers, bias,
batch_first, dropout, bidirectional[, nonlinearity]).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import to_bool
from .common import FastDropout, orthogonal_init, torch_linear_uniform
from .recurrent import _reverse_time


class _CudnnBase(nn.Module):
    options: Dict[str, Any]
    inp_dim: int

    N_GATES = 1

    @classmethod
    def compute_out_dim(cls, options, inp_dim) -> int:
        hidden = int(options["hidden_size"])
        bidir = to_bool(options.get("bidirectional", "False"))
        return hidden * (2 if bidir else 1)

    @property
    def out_dim(self) -> int:
        return self.compute_out_dim(self.options, self.inp_dim)

    def init_state(self, k, batch, hidden):
        return jnp.zeros((k, batch, hidden), dtype=jnp.float32)

    def cell(self, state, ff_t, rec_h, nonlinearity):
        raise NotImplementedError

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        o = self.options
        hidden = int(o["hidden_size"])
        n_layers = int(o["num_layers"])
        use_bias = to_bool(o.get("bias", "True"))
        dropout = float(o.get("dropout", 0.0))
        bidir = to_bool(o.get("bidirectional", "False"))
        nonlinearity = o.get("nonlinearity", "tanh")
        # quirk-compatible: the reference never passes batch_first to the
        # torch RNN — the flag ONLY gates orthogonal hh init
        # (neural_networks.py:178-183); data stays (T, B, D) throughout
        ortho_hh = to_bool(o.get("batch_first", "False"))

        G = self.N_GATES
        K = 2 if bidir else 1  # directions with SEPARATE weights (as torch)
        for layer in range(n_layers):
            T, B, D = x.shape
            if bidir:
                x2 = jnp.stack([x, _reverse_time(x, lengths)], axis=1)
            else:
                x2 = x[:, None]  # (T, K, B, D)
            w_ih = self.param(
                f"w_ih{layer}", torch_linear_uniform(hidden), (K, D, G * hidden)
            )
            w_hh = self.param(
                f"w_hh{layer}",
                orthogonal_init() if ortho_hh else torch_linear_uniform(hidden),
                (K, hidden, G * hidden),
            )
            ff = jnp.einsum("tkbd,kdh->tkbh", x2, w_ih)
            if use_bias:
                b_ih = self.param(
                    f"b_ih{layer}", torch_linear_uniform(hidden),
                    (K, G * hidden),
                )
                b_hh = self.param(
                    f"b_hh{layer}", torch_linear_uniform(hidden),
                    (K, G * hidden),
                )
                ff = ff + b_ih[None, :, None, :]
            else:
                b_hh = jnp.zeros((K, G * hidden), x.dtype)

            # torch semantics: b_hh is added to the RECURRENT pre-activation
            # (matters for GRU, where the reset gate multiplies r*(W_hn h +
            # b_hn) — folding b_hn into ff would skip the gating)
            def step(state, ff_t, w_hh=w_hh, b_hh=b_hh,
                     nonlinearity=nonlinearity):
                def rec(h):  # h (K, B, H)
                    return jnp.einsum("kbh,khg->kbg", h, w_hh) + b_hh[:, None, :]

                return self.cell(state, ff_t, rec, nonlinearity)

            _, h = jax.lax.scan(step, self.init_state(K, B, hidden), ff)
            # h (T, K, B, H)
            if bidir:
                h_f = h[:, 0]
                h_b = _reverse_time(h[:, 1], lengths)
                h = jnp.concatenate([h_f, h_b], axis=2)
            else:
                h = h[:, 0]
            if layer < n_layers - 1:
                h = FastDropout(rate=dropout, deterministic=not train)(h)
            x = h
        return x


def _gates(v, n, hidden):
    return [v[..., a * hidden : (a + 1) * hidden] for a in range(n)]


class LSTM_cudnn(_CudnnBase):
    """Standard LSTM, torch gate order (i, f, g, o)."""

    N_GATES = 4

    def init_state(self, k, batch, hidden):
        z = jnp.zeros((k, batch, hidden), dtype=jnp.float32)
        return (z, z)

    def cell(self, state, ff_t, rec, nonlinearity):
        h, c = state
        hidden = h.shape[-1]
        fi, ff_, fg, fo = _gates(ff_t, 4, hidden)
        ri, rf, rg, ro = _gates(rec(h), 4, hidden)
        i = jax.nn.sigmoid(fi + ri)
        f = jax.nn.sigmoid(ff_ + rf)
        g = jnp.tanh(fg + rg)
        o = jax.nn.sigmoid(fo + ro)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h


class GRU_cudnn(_CudnnBase):
    """Standard GRU, torch gate order (r, z, n)."""

    N_GATES = 3

    def cell(self, state, ff_t, rec, nonlinearity):
        h = state
        hidden = h.shape[-1]
        fr, fz, fn = _gates(ff_t, 3, hidden)
        rr, rz, rn = _gates(rec(h), 3, hidden)
        r = jax.nn.sigmoid(fr + rr)
        z = jax.nn.sigmoid(fz + rz)
        n = jnp.tanh(fn + r * rn)
        h = (1 - z) * n + z * h
        return h, h


class RNN_cudnn(_CudnnBase):
    """Elman RNN with tanh or relu nonlinearity."""

    N_GATES = 1

    def cell(self, state, ff_t, rec, nonlinearity):
        act = jnp.tanh if nonlinearity == "tanh" else jax.nn.relu
        h = act(ff_t + rec(state))
        return h, h
