"""SRU — Simple Recurrent Unit, implemented natively.

The reference only wraps the external `sru` CUDA package
(neural_networks.py:1973-2021; import commented out at :17-20).  Here the
cell (Lei et al., "Simple Recurrent Units for Highly Parallelizable
Recurrence") is implemented directly — it is the most TPU-friendly cell in
the zoo: ALL matmuls are feed-forward (hoisted, one fused (T*B, D) @
(D, 3H) MXU matmul) and the recurrence is purely elementwise, so the scan
body runs entirely on the VPU:

  f_t = sigmoid(W_f x_t + v_f * c_{t-1} + b_f)
  c_t = f_t * c_{t-1} + (1 - f_t) * (W x_t)
  r_t = sigmoid(W_r x_t + v_r * c_{t-1} + b_r)
  h_t = r_t * g(c_t) + (1 - r_t) * x'_t * alpha   (highway skip)

where x'_t = x_t when input dim == hidden, else a learned projection
(the sru package's 4th weight block).  Per the sru package convention,
`sru_highway_bias` initializes the RESET gate bias b_r (b_f starts at
zero) and alpha = (1 + 2 e^{b_r})^0.5 rescales the skip when sru_rescale.

Options follow proto/SRU.proto: sru_hidden_size, sru_num_layers,
sru_dropout (between layers), sru_rnn_dropout (on input), sru_use_tanh/
relu/selu, sru_bidirectional, sru_has_skip_term, sru_highway_bias,
sru_rescale; sru_layer_norm applies laynorm on layer inputs.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import to_bool
from .common import FastDropout, RefLayerNorm, torch_linear_uniform
from .recurrent import _reverse_time


class SRU(nn.Module):
    options: Dict[str, Any]
    inp_dim: int

    @classmethod
    def compute_out_dim(cls, options, inp_dim) -> int:
        hidden = int(options["sru_hidden_size"])
        bidir = to_bool(options.get("sru_bidirectional", "False"))
        return hidden * (2 if bidir else 1)

    @property
    def out_dim(self) -> int:
        return self.compute_out_dim(self.options, self.inp_dim)

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        o = self.options
        hidden = int(o["sru_hidden_size"])
        n_layers = int(o["sru_num_layers"])
        dropout = float(o.get("sru_dropout", 0.0))
        rnn_dropout = float(o.get("sru_rnn_dropout", 0.0))
        bidir = to_bool(o.get("sru_bidirectional", "False"))
        skip = to_bool(o.get("sru_has_skip_term", "True"))
        layer_norm = to_bool(o.get("sru_layer_norm", "False"))
        highway_bias = float(o.get("sru_highway_bias", 0.0))
        rescale = to_bool(o.get("sru_rescale", "True"))
        if to_bool(o.get("sru_use_relu", "False")):
            g = jax.nn.relu
        elif to_bool(o.get("sru_use_selu", "False")):
            g = jax.nn.selu
        elif to_bool(o.get("sru_use_tanh", "True")):
            g = jnp.tanh
        else:
            g = lambda v: v

        # scaling correction for the highway sum (sru rescale option)
        alpha = (1.0 + jnp.exp(highway_bias) * 2.0) ** 0.5 if rescale else 1.0

        for layer in range(n_layers):
            T, B, D = x.shape
            if layer_norm:
                x = RefLayerNorm(D, name=f"ln{layer}")(x)
            x = FastDropout(rate=rnn_dropout, deterministic=not train)(x)
            if bidir:
                x = jnp.concatenate([x, _reverse_time(x, lengths)], axis=1)
            Bp = x.shape[1]

            # the sru package packs a 4th weight block projecting x for the
            # highway term whenever n_in != out_size (k=4 in SRUCell); with
            # matching dims the raw x is used
            project_skip = skip and D != hidden
            n_blocks = 4 if project_skip else 3
            w = self.param(
                f"w{layer}", torch_linear_uniform(D), (D, n_blocks * hidden)
            )
            vf = self.param(f"vf{layer}", nn.initializers.zeros, (hidden,))
            vr = self.param(f"vr{layer}", nn.initializers.zeros, (hidden,))
            # sru convention (SRUCell.reset_parameters): the forget bias is
            # zero and highway_bias lands on the RESET/highway gate bias
            bf = self.param(f"bf{layer}", nn.initializers.zeros, (hidden,))
            br = self.param(
                f"br{layer}",
                nn.initializers.constant(highway_bias),
                (hidden,),
            )

            ff = (x.reshape(T * Bp, D) @ w).reshape(T, Bp, n_blocks * hidden)
            u, wf_x, wr_x = (
                ff[..., :hidden],
                ff[..., hidden : 2 * hidden],
                ff[..., 2 * hidden : 3 * hidden],
            )
            x_skip = ff[..., 3 * hidden :] if project_skip else x
            use_skip = skip

            def step(c, inp, vf=vf, vr=vr, bf=bf, br=br, g=g,
                     use_skip=use_skip, alpha=alpha):
                u_t, wf_t, wr_t, x_t = inp
                f = jax.nn.sigmoid(wf_t + vf * c + bf)
                c = f * c + (1 - f) * u_t
                r = jax.nn.sigmoid(wr_t + vr * c + br)
                h = r * g(c)
                if use_skip:
                    h = h + (1 - r) * x_t * alpha
                return c, h

            c0 = jnp.zeros((Bp, hidden), dtype=x.dtype)
            _, h = jax.lax.scan(step, c0, (u, wf_x, wr_x, x_skip))
            if bidir:
                h_f = h[:, : Bp // 2]
                h_b = _reverse_time(h[:, Bp // 2 :], lengths)
                h = jnp.concatenate([h_f, h_b], axis=2)
            h = FastDropout(rate=dropout, deterministic=not train)(h)
            x = h
        return x
