"""fusionRNN — multi-microphone Li-GRU with a shared-weight fusion layer
(reference neural_networks.py:719-996 fusionRNN_jit/liGRU_layer, :2057-2099
FusionLinearConv; used by cfg/DIRHA_baselines/DIRHA_fusionRNN_MFCC_6ch.cfg).

Structure per the reference: a stack of always-bidirectional fused Li-GRU
layers (ReLU candidate, batchnorm on the feed-forward path, fused 2H
recurrent matmul); layer 0 optionally replaces the wz/wh linears with a
FusionLinearConv — ONE weight matrix shared across all microphones,
applied per-mic (strided conv in the reference; an einsum over a (M, Din/M)
reshape here — same arithmetic, MXU-friendly) and reduced by sum/mean.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import to_bool
from .common import (
    float_list,
    int_list,
    make_batchnorm,
    orthogonal_init,
)
from .recurrent import _reverse_time


def _fusion_act(name: str):
    if name == "leaky_relu" or name == "leaky":
        return lambda x: jax.nn.leaky_relu(x, 0.01)
    if name == "relu":
        return jax.nn.relu
    if name == "prelu":
        # PReLU with the torch-default fixed 0.25 slope (single shared param
        # in torch; kept constant here)
        return lambda x: jnp.where(x >= 0, x, 0.25 * x)
    return jnp.tanh


class FusionLinear(nn.Module):
    """Shared-weight multi-mic projection: (..., M * Din_per_mic) ->
    (..., out) with one (Din_per_mic -> out) map applied to every mic and
    sum/mean-reduced (FusionLinearConv, neural_networks.py:2082-2097)."""

    out_features: int
    number_of_mic: int
    act: str = "prelu"
    reduce: str = "sum"

    @nn.compact
    def __call__(self, x):
        in_total = x.shape[-1]
        per_mic = in_total // self.number_of_mic
        w = self.param(
            "w", nn.initializers.xavier_normal(), (per_mic, self.out_features)
        )
        b = self.param("b", nn.initializers.zeros, (self.out_features,))
        xm = x.reshape(x.shape[:-1] + (self.number_of_mic, per_mic))
        out = _fusion_act(self.act)(jnp.einsum("...md,dh->...mh", xm, w) + b)
        if self.reduce == "mean":
            return out.mean(axis=-2)
        return out.sum(axis=-2)


class fusionRNN(nn.Module):
    """Options follow the DIRHA cfg keys (lowercased by configparser):
    fusionrnn_lay, fusionrnn_drop, fusionrnn_do_fusion,
    fusionrnn_fusion_layer_size, fusionrnn_number_of_mic,
    fusionrnn_fusion_act, fusionrnn_fusion_reduce."""

    options: Dict[str, Any]
    inp_dim: int

    @classmethod
    def compute_out_dim(cls, options, inp_dim) -> int:
        lay = int_list(options["fusionrnn_lay"])
        return 2 * lay[-1]  # always bidirectional (reference :736)

    @property
    def out_dim(self) -> int:
        return self.compute_out_dim(self.options, self.inp_dim)

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        o = self.options
        lay = int_list(o["fusionrnn_lay"])
        drop = float_list(o["fusionrnn_drop"])
        do_fusion = to_bool(o.get("fusionrnn_do_fusion", "False"))
        n_mic = int(o.get("fusionrnn_number_of_mic", 1))
        fusion_size = int(o.get("fusionrnn_fusion_layer_size", 64))
        fusion_act = o.get("fusionrnn_fusion_act", "prelu")
        fusion_reduce = o.get("fusionrnn_fusion_reduce", "sum")

        for i, hidden_cfg in enumerate(lay):
            fuse = do_fusion and i == 0
            hidden = fusion_size // n_mic if fuse else hidden_cfg
            T, B, D = x.shape
            x = jnp.concatenate([x, _reverse_time(x, lengths)], axis=1)
            Bp = x.shape[1]

            if fuse:
                wz = FusionLinear(hidden, n_mic, fusion_act, fusion_reduce,
                                  name=f"fuse_wz{i}")(x)
                wh = FusionLinear(hidden, n_mic, fusion_act, fusion_reduce,
                                  name=f"fuse_wh{i}")(x)
            else:
                w = self.param(
                    f"w{i}", nn.initializers.xavier_normal(), (D, 2 * hidden)
                )
                b = self.param(f"b{i}", nn.initializers.zeros, (2 * hidden,))
                ff = x.reshape(T * Bp, D) @ w + b
                ff = ff.reshape(T, Bp, 2 * hidden)
                wh, wz = ff[..., :hidden], ff[..., hidden:]

            # batchnorm over (T*B) per gate (reference :893-897)
            wz = make_batchnorm(not train, name=f"bn_wz{i}")(
                wz.reshape(T * Bp, hidden)
            ).reshape(T, Bp, hidden)
            wh = make_batchnorm(not train, name=f"bn_wh{i}")(
                wh.reshape(T * Bp, hidden)
            ).reshape(T, Bp, hidden)

            u = self.param(f"u{i}", orthogonal_init(), (hidden, 2 * hidden))
            # inverted dropout mask shared across time (reference uses
            # nn.Dropout on a ones tensor -> scaled masks, :918-975)
            if train and drop[i] > 0.0:
                key = self.make_rng("dropout")
                mask = jax.random.bernoulli(
                    key, 1.0 - drop[i], (Bp, hidden)
                ).astype(jnp.float32) / (1.0 - drop[i])
            else:
                mask = jnp.asarray(1.0, dtype=jnp.float32)
            # compute dtype keeps the scan carry uniform under bf16 mode
            mask = mask.astype(x.dtype)

            def step(h, g_t, u=u, mask=mask, hidden=hidden):
                wz_t, wh_t = g_t
                r = h @ u
                uz, uh = r[:, :hidden], r[:, hidden:]
                zt = jax.nn.sigmoid(wz_t + uz)
                hcand = jax.nn.relu(wh_t + uh) * mask
                h = zt * h + (1 - zt) * hcand
                return h, h

            h0 = jnp.zeros((Bp, hidden), dtype=x.dtype)
            _, h = jax.lax.scan(step, h0, (wz, wh))
            h_f = h[:, : Bp // 2]
            h_b = _reverse_time(h[:, Bp // 2 :], lengths)
            x = jnp.concatenate([h_f, h_b], axis=2)
        return x


# reference class name (cfg arch_class = fusionRNN_jit)
fusionRNN_jit = fusionRNN
