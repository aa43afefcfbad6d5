"""PASE waveform encoder — native flax implementation + torch-checkpoint
import (reference neural_networks.py:2023-2055 merely wraps the external
`pase` package; here the encoder itself is implemented, so forward runs
without torch).

Architecture (PASE frontend, Pascual et al., Interspeech 2019: a SincNet
first convolution followed by a stack of strided Conv1d+BatchNorm+PReLU
blocks that decimate 16 kHz samples to a 10 ms frame rate, ending in a
1x1 convolution to the embedding dimension):

    sinc(64, k=251, s=1) -> [Conv(f_i, k_i, s_i) + BN + PReLU] x N
                         -> Conv(emb_dim, 1) + BN

Every structural knob is read from the `pase_cfg` json (the same file the
reference passes to pase's wf_builder): required `emb_dim`; optional
`fmaps`, `kwidths`, `strides`, `sinc_out`, `sinc_kwidth`, `sample_rate`
with the documented defaults (overall decimation = prod(strides) = 160,
i.e. 10 ms at 16 kHz).

Pretrained weights: `pase_model` may point at (a) a checkpoint converted
with `tpukaldi.compat.convert_pase_checkpoint` (native msgpack, no torch
needed at runtime) loaded through the standard arch_pretrain_file path, or
(b) nothing — the encoder trains from random init like any other module.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .cnn import sinc_filters_fast
from .registry import register

# PASE frontend defaults (overridable via the pase_cfg json)
DEFAULT_FMAPS = (64, 128, 128, 256, 256, 512, 512)
DEFAULT_KWIDTHS = (10, 5, 5, 5, 5, 5, 5)
DEFAULT_STRIDES = (10, 2, 2, 2, 1, 2, 1)  # x sinc stride 1 -> 160 overall
DEFAULT_SINC_OUT = 64
DEFAULT_SINC_KWIDTH = 251


# parsed-cfg cache: the json is constant per experiment but read_pase_cfg
# is hit on every module trace / out_dim access; key on (path, mtime, size)
# so a rewritten file (tests) still invalidates
_CFG_CACHE: Dict[tuple, Dict[str, Any]] = {}


def read_pase_cfg(options: Dict[str, Any]) -> Dict[str, Any]:
    cfg: Dict[str, Any] = {}
    path = options.get("pase_cfg", "")
    if path:
        import os

        st = os.stat(path)
        key = (os.path.abspath(path), st.st_mtime_ns, st.st_size,
               options.get("emb_dim"))
        hit = _CFG_CACHE.get(key)
        if hit is not None:
            return hit
        with open(path) as f:
            cfg = json.load(f)
    out = {
        "emb_dim": int(cfg.get("emb_dim", options.get("emb_dim", 100))),
        "fmaps": tuple(cfg.get("fmaps", DEFAULT_FMAPS)),
        "kwidths": tuple(cfg.get("kwidths", DEFAULT_KWIDTHS)),
        "strides": tuple(cfg.get("strides", DEFAULT_STRIDES)),
        "sinc_out": int(cfg.get("sinc_out", DEFAULT_SINC_OUT)),
        "sinc_kwidth": int(cfg.get("sinc_kwidth", DEFAULT_SINC_KWIDTH)),
        "sample_rate": int(cfg.get("sample_rate", 16000)),
    }
    if path:
        _CFG_CACHE[key] = out
    return out


@register
class PASE(nn.Module):
    """Sequential module: (T, B, 1) raw samples -> (T', B, emb_dim) frames,
    T' = T // prod(strides)."""

    options: Dict[str, Any]
    inp_dim: int

    @classmethod
    def compute_out_dim(cls, options, inp_dim) -> int:
        return read_pase_cfg(options)["emb_dim"]

    @property
    def out_dim(self) -> int:
        return self.compute_out_dim(self.options, self.inp_dim)

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        cfg = read_pase_cfg(self.options)
        # (T, B, C) -> (B, T, C) for NWC convs
        h = x.transpose(1, 0, 2)

        # sinc front-end (mel-spaced init, half-window symmetry trick)
        n_sinc, k_sinc = cfg["sinc_out"], cfg["sinc_kwidth"]
        sr = cfg["sample_rate"]
        low = self.param(
            "low_hz", _mel_low_init(n_sinc, sr), (n_sinc, 1)
        )
        band = self.param(
            "band_hz", _mel_band_init(n_sinc, sr), (n_sinc, 1)
        )
        filt = sinc_filters_fast(low, band, k_sinc, sr,
                                 min_low_hz=50.0, min_band_hz=50.0)
        # filt (n_sinc, k) -> NWC kernel (k, in=1, n_sinc); PASE applies
        # |.| after the sinc conv (rectified band energies)
        kernel = filt.T[:, None, :]
        h = jnp.abs(_conv_nwc(h, kernel, stride=1))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.95,
                         name="sinc_bn")(h)
        h = self._prelu("sinc_act", h)

        for i, (f, k, s) in enumerate(
            zip(cfg["fmaps"], cfg["kwidths"], cfg["strides"])
        ):
            h = nn.Conv(features=f, kernel_size=(k,), strides=(s,),
                        padding="SAME", name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.95,
                             name=f"bn{i}")(h)
            h = self._prelu(f"act{i}", h)

        h = nn.Conv(features=cfg["emb_dim"], kernel_size=(1,),
                    name="emb")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.95,
                         name="emb_bn")(h)
        return h.transpose(1, 0, 2)  # (T', B, emb)

    def _prelu(self, name, h):
        """Per-channel PReLU (torch nn.PReLU(C) semantics, init 0.25)."""
        a = self.param(name, nn.initializers.constant(0.25),
                       (h.shape[-1],))
        return jnp.where(h >= 0, h, a * h)


def _conv_nwc(x, kernel, stride):
    import jax

    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _mel_spaced_hz(n_filt: int, sr: int):
    """Mel-spaced cutoff grid, 30 Hz .. sr/2-100 Hz — the same spacing the
    SincNet init uses (cnn.py `SincConv` mel linspace, min_low+min_band =
    100); shared via cnn.py's _to_mel/_to_hz so the two can't drift."""
    import numpy as np

    from .cnn import _to_hz, _to_mel

    low_hz, high_hz = 30.0, sr / 2 - 100.0
    return _to_hz(np.linspace(_to_mel(low_hz), _to_mel(high_hz), n_filt + 1))


def _mel_low_init(n_filt: int, sr: int):
    def init(key, shape, dtype=jnp.float32):
        hz = _mel_spaced_hz(n_filt, sr)
        return jnp.asarray(hz[:-1, None], dtype)

    return init


def _mel_band_init(n_filt: int, sr: int):
    def init(key, shape, dtype=jnp.float32):
        import numpy as np

        hz = _mel_spaced_hz(n_filt, sr)
        return jnp.asarray(np.diff(hz)[:, None], dtype)

    return init


def decimation(options: Dict[str, Any]) -> int:
    """Samples per output frame (the raw-wave window_shift for this
    encoder)."""
    out = 1
    for s in read_pase_cfg(options)["strides"]:
        out *= s
    return out
