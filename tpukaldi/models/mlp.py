"""MLP — feed-forward stack with per-layer dropout/batchnorm/laynorm toggles
(reference: neural_networks.py:60-150).

TPU notes: the whole stack is dense matmuls, bf16-friendly; XLA fuses
activation+norm into the matmul epilogue.  Inputs are (N, D) — sequential
callers flatten (T, B, D) -> (T*B, D) in the graph compiler, like the
reference's view() shim (utils.py:2320-2339).
"""

from __future__ import annotations

from typing import Any, Dict

from flax import linen as nn

from ..config.schema import to_bool
from .common import (
    FastDropout,
    RefLayerNorm,
    act_fun,
    bool_list,
    float_list,
    glorot_small_uniform,
    int_list,
    make_batchnorm,
)


class MLP(nn.Module):
    options: Dict[str, Any]
    inp_dim: int

    @staticmethod
    def compute_out_dim(options: Dict[str, str], inp_dim: int) -> int:
        return int_list(options["dnn_lay"])[-1]

    @property
    def out_dim(self) -> int:
        return self.compute_out_dim(self.options, self.inp_dim)

    @nn.compact
    def __call__(self, x, train: bool = False):
        o = self.options
        lay = int_list(o["dnn_lay"])
        drop = float_list(o["dnn_drop"])
        use_bn = bool_list(o["dnn_use_batchnorm"])
        use_ln = bool_list(o["dnn_use_laynorm"])
        acts = o["dnn_act"].split(",")

        if to_bool(o.get("dnn_use_laynorm_inp", "False")):
            x = RefLayerNorm(self.inp_dim, name="ln_inp")(x)
        if to_bool(o.get("dnn_use_batchnorm_inp", "False")):
            x = make_batchnorm(not train, name="bn_inp")(x)

        current = self.inp_dim
        for i, width in enumerate(lay):
            use_bias = not (use_ln[i] or use_bn[i])
            x = nn.Dense(
                width,
                use_bias=use_bias,
                kernel_init=glorot_small_uniform(current, width),
                bias_init=nn.initializers.zeros,
                name=f"wx{i}",
            )(x)
            if use_ln[i]:
                x = RefLayerNorm(width, name=f"ln{i}")(x)
            if use_bn[i]:
                x = make_batchnorm(not train, name=f"bn{i}")(x)
            x = act_fun(acts[i])(x)
            # torch nn.Dropout (inverted dropout), identity at eval
            x = FastDropout(rate=drop[i], deterministic=not train)(x)
            current = width
        return x
