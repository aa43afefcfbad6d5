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
from .common import orthogonal_init, torch_linear_uniform
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

    def init_state(self, batch, hidden):
        return jnp.zeros((batch, hidden), dtype=jnp.float32)

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
        if to_bool(o.get("batch_first", "False")):
            x = x.transpose(1, 0, 2)

        G = self.N_GATES
        for layer in range(n_layers):
            T, B, D = x.shape
            if bidir:
                x = jnp.concatenate([x, _reverse_time(x, lengths)], axis=1)
            Bp = x.shape[1]
            w_ih = self.param(
                f"w_ih{layer}", torch_linear_uniform(hidden), (D, G * hidden)
            )
            w_hh = self.param(
                f"w_hh{layer}", orthogonal_init(), (hidden, G * hidden)
            )
            ff = x.reshape(T * Bp, D) @ w_ih
            if use_bias:
                b_ih = self.param(
                    f"b_ih{layer}", torch_linear_uniform(hidden), (G * hidden,)
                )
                b_hh = self.param(
                    f"b_hh{layer}", torch_linear_uniform(hidden), (G * hidden,)
                )
                ff = ff + b_ih + b_hh
            ff = ff.reshape(T, Bp, G * hidden)

            def step(state, ff_t, w_hh=w_hh, nonlinearity=nonlinearity):
                return self.cell(state, ff_t, lambda h: h @ w_hh, nonlinearity)

            _, h = jax.lax.scan(step, self.init_state(Bp, hidden), ff)
            if bidir:
                h_f = h[:, : Bp // 2]
                h_b = _reverse_time(h[:, Bp // 2 :], lengths)
                h = jnp.concatenate([h_f, h_b], axis=2)
            if layer < n_layers - 1:
                h = nn.Dropout(rate=dropout, deterministic=not train)(h)
            x = h
        if to_bool(o.get("batch_first", "False")):
            x = x.transpose(1, 0, 2)
        return x


def _gates(v, n, hidden):
    return [v[..., a * hidden : (a + 1) * hidden] for a in range(n)]


class LSTM_cudnn(_CudnnBase):
    """Standard LSTM, torch gate order (i, f, g, o)."""

    N_GATES = 4

    def init_state(self, batch, hidden):
        z = jnp.zeros((batch, hidden), dtype=jnp.float32)
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
