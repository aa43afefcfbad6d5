"""Raw-waveform front-ends: CNN, SincNet (parametric band-pass convs),
logMelFb, channel_averaging.

Semantics follow the reference (neural_networks.py:1464-1556 CNN,
:1559-1665 SincNet, :1668-1959 SincConv/SincConv_fast, :658-699 logMelFb,
:702-717 channel_averaging):

- CNN/SincNet consume flat (N, samples) windows (arch_seq_model=False; the
  raw-wave chunker cuts 200 ms windows, save_raw_fea.py) and emit
  (N, out_dim) flattened conv features;
- conv stacks are valid 1-D convolutions + max-pool with per-layer
  dropout / batchnorm / (filt,time)-shaped laynorm toggles;
- SincConv synthesizes mel-initialized band-pass filters from learnable
  (low_hz, band_hz) every forward — on TPU the synthesis is a tiny
  elementwise op and the conv maps to the MXU via im2col/conv lowering;
- logMelFb: STFT (hann, center=False) -> power -> HTK mel filterbank ->
  safe log10, over (samples, B, 1) signals;
- channel_averaging: fixed normalized channel weights, (T, B, C) -> (T, B, 1).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import to_bool
from .common import (
    FastDropout,
    RefLayerNorm,
    act_fun,
    ref_laynorm,
    bool_list,
    float_list,
    int_list,
    make_batchnorm,
    torch_linear_uniform,
)


def _conv1d(x, kernel, stride: int = 1):
    """x (N, C, L), kernel (O, I, K) -> (N, O, L_out), valid padding."""
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )


def _max_pool1d(x, pool: int):
    """torch F.max_pool1d default: stride = kernel, floor division."""
    if pool <= 1:
        return x
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, pool),
        window_strides=(1, 1, pool),
        padding="VALID",
    )


# ---- channels-last / MXU lowering (the default compute path) --------------
#
# The NCH lax.conv path above maps the raw-waveform stacks badly onto the
# TPU: the (filt, time) laynorm + torch-layout batchnorm force relayouts
# around every layer.  The default path keeps activations channels-last
# (N, L, C) — normalizations read the natural layout — and lowers each
# valid 1-D conv through XLA's native NHC conv emitter, which streams the
# implicit im2col through VMEM.  (Round 3 tried an explicit im2col +
# dot_general here; measured on the real chip it LOSES 2.5x to the conv
# emitter because the K=129 layer-0 patch tensor is a 129x-expanded HBM
# round trip — ~200 MB at recipe shapes — while the emitter never
# materializes it.)  Selectable via TPUKALDI_CONV_IMPL={nhc (default),
# dot, xla} for A/B benching; all paths create identical parameter trees
# (names, shapes, init), so checkpoints and torch imports are
# layout-independent.


def _im2col(x, K: int):
    """x (N, L, C) -> stride-1 valid patches (N, L-K+1, K*C), flattened in
    (tap, channel) minor order to match kernel (O, I, K).transpose(2, 1, 0).
    Static slices (not gather): XLA fuses them into a single copy."""
    N, L, C = x.shape
    L_out = L - K + 1
    patches = jnp.stack([x[:, k:k + L_out, :] for k in range(K)], axis=2)
    return patches.reshape(N, L_out, K * C)


def _conv1d_dot(x, kernel):
    """Valid stride-1 conv, channels-last via im2col + dot_general:
    x (N, L, C), kernel (O, I, K) -> (N, L_out, O)."""
    O, I, K = kernel.shape
    w = kernel.transpose(2, 1, 0).reshape(K * I, O)  # (tap, chan) rows
    return _im2col(x, K) @ w


def _conv1d_nhc(x, kernel):
    """Valid stride-1 conv, channels-last via XLA's native NHC emitter:
    x (N, L, C), kernel (O, I, K) -> (N, L_out, O)."""
    return jax.lax.conv_general_dilated(
        x, kernel.transpose(2, 1, 0),  # (K, I, O) = HIO
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def _max_pool1d_cl(x, pool: int):
    """Channels-last max-pool, torch semantics (stride = kernel, floor):
    a reshape+max — no reduce_window — since the tail is trimmed."""
    if pool <= 1:
        return x
    N, L, C = x.shape
    L_out = L // pool
    if L_out * pool != L:
        x = x[:, : L_out * pool, :]
    return x.reshape(N, L_out, pool, C).max(axis=2)


class _CNNLayerNorm(nn.Module):
    """Reference LayerNorm instantiated with a (filt, time) shape
    (neural_networks.py:1510-1512): normalizes over the reference's LAST
    axis (time), affine params over the full (filt, time) map.  Accepts
    either layout; the param tree is layout-independent.  setup-style so
    the fused layer-0 kernel path can read the affine map via affine()
    without running the module (identical param names/shapes either way)."""

    n_filt: int
    n_time: int
    eps: float = 1e-6
    channels_last: bool = False

    def setup(self):
        self.gamma = self.param(
            "gamma", nn.initializers.ones, (self.n_filt, self.n_time))
        self.beta = self.param(
            "beta", nn.initializers.zeros, (self.n_filt, self.n_time))

    def affine(self):
        return self.gamma, self.beta

    def __call__(self, x):  # x (N, filt, time) or (N, time, filt)
        gamma, beta = self.gamma, self.beta
        if not self.channels_last:
            return ref_laynorm(x, gamma, beta, self.eps)
        # channels-last: time is axis 1; same unbiased-std formula as
        # ref_laynorm, moments in f32
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.sum((xf - mean) ** 2, axis=1, keepdims=True) / max(
            self.n_time - 1, 1
        )
        y = (gamma.T.astype(jnp.float32) * (xf - mean) / (jnp.sqrt(var) + self.eps)
             + beta.T.astype(jnp.float32))
        return y.astype(x.dtype)


def _to_mel(hz):
    return 2595 * np.log10(1 + hz / 700)


def _to_hz(mel):
    return 700 * (10 ** (mel / 2595) - 1)


def sinc_filters_fast(low_hz_, band_hz_, kernel_size: int, sample_rate: int,
                      min_low_hz: float, min_band_hz: float):
    """Synthesize band-pass filters, half-window symmetry trick
    (SincConv_fast, neural_networks.py:1915-1949)."""
    half = (kernel_size - 1) // 2
    n_lin = jnp.linspace(0, (kernel_size / 2) - 1, int(kernel_size / 2))
    window = 0.54 - 0.46 * jnp.cos(2 * math.pi * n_lin / kernel_size)
    n_ = 2 * math.pi * jnp.arange(-half, 0.0)[None, :] / sample_rate

    low = min_low_hz + jnp.abs(low_hz_)
    high = jnp.clip(low + min_band_hz + jnp.abs(band_hz_),
                    min_low_hz, sample_rate / 2)
    band = (high - low)[:, 0]
    f_low = low @ n_
    f_high = high @ n_
    bp_left = ((jnp.sin(f_high) - jnp.sin(f_low)) / (n_ / 2)) * window
    bp_center = 2 * band[:, None]
    bp_right = jnp.flip(bp_left, axis=1)
    band_pass = jnp.concatenate([bp_left, bp_center, bp_right], axis=1)
    band_pass = band_pass / (2 * band[:, None])
    return band_pass  # (out_channels, kernel_size)


def sinc_filters_slow(low_hz_, band_hz_, kernel_size: int, sample_rate: int,
                      min_low_hz: float, min_band_hz: float):
    """Original SincConv synthesis with normalized frequencies and max-norm
    (neural_networks.py:1789-1803)."""
    half = (kernel_size - 1) // 2
    n_lin = jnp.linspace(0, kernel_size, kernel_size)
    window = 0.54 - 0.46 * jnp.cos(2 * math.pi * n_lin / kernel_size)
    n_ = jnp.arange(-half, half + 1.0)[None, :] / sample_rate

    def stable_sinc(x):
        x_left = x[:, :half]
        y_left = jnp.sin(x_left) / x_left
        y_right = jnp.flip(y_left, axis=1)
        ones = jnp.ones((x.shape[0], 1))
        return jnp.concatenate([y_left, ones, y_right], axis=1)

    low = min_low_hz / sample_rate + jnp.abs(low_hz_)
    high = low + min_band_hz / sample_rate + jnp.abs(band_hz_)
    lp1 = 2 * low * stable_sinc(2 * math.pi * (low @ n_) * sample_rate)
    lp2 = 2 * high * stable_sinc(2 * math.pi * (high @ n_) * sample_rate)
    band_pass = lp2 - lp1
    band_pass = band_pass / jnp.max(band_pass, axis=1, keepdims=True)
    return band_pass * window


class _ConvStack(nn.Module):
    """Shared CNN/SincNet scaffold; layer 0 is a hook."""

    options: Dict[str, Any]
    inp_dim: int

    PREFIX = "cnn"

    @classmethod
    def _dims(cls, options, inp_dim):
        p = cls.PREFIX
        n_filt = int_list(options[f"{p}_n_filt"])
        len_filt = int_list(options[f"{p}_len_filt"])
        pool = int_list(options[f"{p}_max_pool_len"])
        current = inp_dim
        for i in range(len(n_filt)):
            # NB: uses the cfg filter length even though SincConv pads even
            # kernels to odd — reference behavior (cfgs use odd lengths)
            current = int((current - len_filt[i] + 1) / pool[i])
        return n_filt, len_filt, pool, current

    @classmethod
    def compute_out_dim(cls, options, inp_dim) -> int:
        n_filt, _, _, current = cls._dims(options, inp_dim)
        return current * n_filt[-1]

    @property
    def out_dim(self) -> int:
        return self.compute_out_dim(self.options, self.inp_dim)

    def first_layer_kernel(self, n_filt, len_filt, dtype):
        """Create layer-0 params and return (kernel (O, I=1, K), bias|None)."""
        raise NotImplementedError

    @nn.compact
    def __call__(self, x, train: bool = False):
        o = self.options
        p = self.PREFIX
        n_filt = int_list(o[f"{p}_n_filt"])
        len_filt = int_list(o[f"{p}_len_filt"])
        pool = int_list(o[f"{p}_max_pool_len"])
        acts = o[f"{p}_act"].split(",")
        drop = float_list(o[f"{p}_drop"])
        use_ln = bool_list(o[f"{p}_use_laynorm"])
        use_bn = bool_list(o[f"{p}_use_batchnorm"])

        # input normalization over the raw sample window (the raw-waveform
        # recipes depend on this; reference neural_networks.py:1491-1497
        # + forward :1536-1541)
        if to_bool(o.get(f"{p}_use_laynorm_inp", "False")):
            x = RefLayerNorm(self.inp_dim, name="ln_inp")(x)
        if to_bool(o.get(f"{p}_use_batchnorm_inp", "False")):
            x = make_batchnorm(not train, name="bn_inp")(x)

        # conv lowering (TPUKALDI_CONV_IMPL):
        #   auto (default) — channels-last; layer 0 (C=1) through the fused
        #     Pallas conv+pool kernel on TPU (kernels/conv1d.py), deeper
        #     layers through XLA's NHC conv emitter;
        #   pallas — force the kernel (interpret mode off-TPU; tests);
        #   nhc / dot / xla — pure-XLA paths kept for A/B benching.
        # All paths build identical parameter trees, so checkpoints and
        # torch imports are layout-independent.
        impl = os.environ.get("TPUKALDI_CONV_IMPL", "auto")
        cl = impl != "xla"
        conv_cl = _conv1d_dot if impl == "dot" else _conv1d_nhc
        on_tpu = jax.default_backend() == "tpu"
        from ..kernels.conv1d import kernel_supported

        # shape gate for auto dispatch: the Mosaic lowering only supports
        # lane-aligned layer-0 filter counts (kernel_supported); other
        # configs fall back to the XLA NHC path.  Forced impl=pallas
        # (interpret-mode tests) bypasses the gate — the interpreter has
        # no Mosaic layout restrictions.
        use_kernel = impl == "pallas" or (
            impl == "auto" and on_tpu
            and kernel_supported(len_filt[0], n_filt[0])
            # bf16 compute mode: Mosaic's strided rotate is 32-bit-only
            # (measured r4; reconfirmed r5 — bf16 input hard-fails the
            # kernel compile), so the kernel runs f32-in/f32-out with
            # casts at the call boundary (below); its multiply dtype is
            # bf16 either way, so the arithmetic is in-family.  Round-4's
            # bf16 A/B lost the kernel entirely and fell to the 10 ms XLA
            # conv stack — the boundary cast keeps the fused layer 0.
            and x.dtype in (jnp.float32, jnp.bfloat16)
        )
        N = x.shape[0]
        x = x.reshape(N, self.inp_dim, 1) if cl else x.reshape(N, 1, self.inp_dim)
        current = self.inp_dim
        fused0 = False
        fused_drop0 = False
        for i in range(len(n_filt)):
            if i == 0:
                kernel, bias = self.first_layer_kernel(
                    n_filt[i], len_filt[i], x.dtype
                )
            else:
                kernel = self.param(
                    f"conv{i}",
                    torch_linear_uniform(n_filt[i - 1] * len_filt[i]),
                    (n_filt[i], n_filt[i - 1], len_filt[i]),
                )
                bias = self.param(
                    f"conv{i}_b",
                    torch_linear_uniform(n_filt[i - 1] * len_filt[i]),
                    (n_filt[i],),
                )
            fuse_ln0 = False
            if cl and i == 0 and x.shape[2] == 1 and use_kernel:
                from ..kernels.conv1d import fused_ln_supported

                # whole-chain fusion when layer 0 is the recipe shape:
                # conv+pool+bias+(time-moment laynorm)+act in one kernel
                # (the XLA laynorm/relu passes over the pooled activation
                # cost as much as the conv itself — round-4 device trace)
                fuse_ln0 = (
                    use_ln[0] and not use_bn[0]
                    and acts[0] in ("relu", "linear")
                    and fused_ln_supported(len_filt[0], n_filt[0],
                                           self.inp_dim, pool[0])
                )
            if fuse_ln0:
                from ..kernels.conv1d import conv1d_pool_ln_act

                w2d = kernel[:, 0, :].transpose(1, 0)  # (K, O)
                interp = impl == "pallas" and not on_tpu
                t0 = int((current - len_filt[0] + 1) / pool[0])
                ln = _CNNLayerNorm(n_filt[0], t0, channels_last=True,
                                   name="ln0")
                gamma, beta = ln.affine()
                b0 = (bias if bias is not None
                      else jnp.zeros((n_filt[0],), x.dtype))
                # fuse layer 0's dropout into the kernel (on-core PRNG;
                # the backward regenerates the mask, so the separate
                # FastDropout pass over the 64 MB pooled activation — and
                # its threefry remat — disappears).  Mask stream differs
                # from FastDropout's (same i.i.d. law); the XLA-composed
                # bwd A/B path can't regenerate it, so it keeps the
                # outer dropout.  TPUKALDI_FUSED_DROPOUT=0 restores the
                # separate pass.
                fdrop = 0.0
                seed = 0
                if (train and drop[0] > 0.0
                        and os.environ.get("TPUKALDI_CONV_BWD",
                                           "pallas") != "xla"
                        and os.environ.get("TPUKALDI_FUSED_DROPOUT",
                                           "1") != "0"):
                    fdrop = drop[0]
                    kd = self.make_rng("dropout")
                    seed = jax.lax.bitcast_convert_type(
                        jax.random.bits(kd, (), jnp.uint32), jnp.int32)
                f32 = jnp.float32
                x = conv1d_pool_ln_act(
                    x[:, :, 0].astype(f32), w2d.astype(f32), b0.astype(f32),
                    gamma.T.astype(f32), beta.T.astype(f32), seed, pool[0],
                    ln.eps, acts[0] == "relu", fdrop, interp,
                    "highest" if interp else "default").astype(x.dtype)
                fused0 = True
                fused_drop0 = fdrop > 0.0
            elif cl and i == 0 and x.shape[2] == 1 and use_kernel:
                # fused Pallas conv+pool for the C=1 first layer; the
                # per-channel bias commutes with max-pool so it adds after
                from ..kernels.conv1d import conv1d_pool

                w2d = kernel[:, 0, :].transpose(1, 0)  # (K, O)
                interp = impl == "pallas" and not on_tpu
                # on TPU: bf16-multiply "default" — the SAME arithmetic
                # XLA's conv paths run there; interpret mode (CPU tests)
                # keeps f32 so outputs match the f32 XLA paths exactly
                x = conv1d_pool(
                    x[:, :, 0].astype(jnp.float32), w2d.astype(jnp.float32),
                    pool[i], interp,
                    "highest" if interp else "default").astype(x.dtype)
                if bias is not None:
                    x = x + bias[None, None, :]
            elif cl:
                x = conv_cl(x, kernel)
                if bias is not None:
                    x = x + bias[None, None, :]
                x = _max_pool1d_cl(x, pool[i])
            else:
                x = _conv1d(x, kernel)
                if bias is not None:
                    x = x + bias[None, :, None]
                x = _max_pool1d(x, pool[i])
            time = int((current - len_filt[i] + 1) / pool[i])
            if use_ln[i] and not (i == 0 and fused0):
                x = _CNNLayerNorm(n_filt[i], time, channels_last=cl,
                                  name=f"ln{i}")(x)
            if use_bn[i]:
                # torch BatchNorm1d on (N, C, L): per-channel stats over N, L
                if cl:
                    xt = make_batchnorm(not train, name=f"bn{i}")(
                        x.reshape(-1, n_filt[i])
                    )
                    x = xt.reshape(N, time, n_filt[i])
                else:
                    xt = x.transpose(0, 2, 1).reshape(-1, n_filt[i])
                    xt = make_batchnorm(not train, name=f"bn{i}")(xt)
                    x = xt.reshape(N, time, n_filt[i]).transpose(0, 2, 1)
            if not (i == 0 and fused0):
                x = act_fun(acts[i])(x)
            if not (i == 0 and fused_drop0):
                x = FastDropout(rate=drop[i], deterministic=not train)(x)
            current = time
        if cl:
            # the reference flattens (N, filt, time) — restore that order
            x = x.transpose(0, 2, 1)
        return x.reshape(N, -1)


class CNN(_ConvStack):
    """Plain conv stack over raw samples (neural_networks.py:1464)."""

    PREFIX = "cnn"

    def first_layer_kernel(self, n_filt, len_filt, dtype):
        kernel = self.param(
            "conv0", torch_linear_uniform(len_filt), (n_filt, 1, len_filt)
        )
        bias = self.param("conv0_b", torch_linear_uniform(len_filt), (n_filt,))
        return kernel, bias


class SincNet(_ConvStack):
    """Conv stack whose first layer is a SincConv (neural_networks.py:1559).
    The reference's SincNet hardwires the ORIGINAL SincConv
    (neural_networks.py:1623-1633, normalized-frequency params + max-norm),
    so that synthesis is the default; `sinc_fast=True` opts into the
    half-window symmetry variant (SincConv_fast, different parameter
    semantics — not checkpoint-compatible with the default)."""

    PREFIX = "sinc"

    def first_layer_kernel(self, n_filt, len_filt, dtype):
        o = self.options
        sample_rate = int(o.get("sinc_sample_rate", 16000))
        min_low_hz = int(o.get("sinc_min_low_hz", 50))
        min_band_hz = int(o.get("sinc_min_band_hz", 50))
        fast = to_bool(o.get("sinc_fast", "False"))
        kernel_size = len_filt + 1 if len_filt % 2 == 0 else len_filt

        low_hz = 30
        high_hz = sample_rate / 2 - (min_low_hz + min_band_hz)
        mel = np.linspace(_to_mel(low_hz), _to_mel(high_hz), n_filt + 1)
        hz = _to_hz(mel)
        if not fast:
            hz = hz / sample_rate

        low_hz_ = self.param(
            "low_hz", lambda key, shape: jnp.asarray(hz[:-1])[:, None], (n_filt, 1)
        )
        band_hz_ = self.param(
            "band_hz", lambda key, shape: jnp.asarray(np.diff(hz))[:, None],
            (n_filt, 1),
        )
        synth = sinc_filters_fast if fast else sinc_filters_slow
        # synthesize in f32 even under the bf16 compute mode: the learnable
        # cutoffs live in Hz (up to nyquist) where bf16's ~3 significant
        # digits would quantize the band edges; the finished filters are
        # cast down for the (FLOP-heavy) convolution below
        filters = synth(
            low_hz_.astype(jnp.float32), band_hz_.astype(jnp.float32),
            kernel_size, sample_rate, min_low_hz, min_band_hz,
        )
        return filters[:, None, :].astype(dtype), None


class logMelFb(nn.Module):
    """On-the-fly log-mel front-end (neural_networks.py:658-699):
    (samples, B, 1) -> (frames, B, n_mels)."""

    options: Dict[str, Any]
    inp_dim: int

    @staticmethod
    def compute_out_dim(options, inp_dim) -> int:
        return int(options["logmelfb_nr_filt"])

    @property
    def out_dim(self) -> int:
        return self.compute_out_dim(self.options, self.inp_dim)

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        o = self.options
        sample_rate = int(o.get("logmelfb_nr_sample_rate", 16000))
        n_mels = int(o["logmelfb_nr_filt"])
        win = int(o["logmelfb_stft_window_size"])
        hop = int(o["logmelfb_stft_window_shift"])
        assert x.shape[-1] == 1, "multi-channel signals not supported"
        signal = x[..., 0].T  # (B, samples)
        B, L = signal.shape
        n_frames = 1 + (L - win) // hop
        # frame (center=False) and window (hann, periodic like torch.stft)
        idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(win)[None, :]
        frames = signal[:, idx]  # (B, frames, win)
        window = 0.5 - 0.5 * jnp.cos(2 * math.pi * jnp.arange(win) / win)
        spec = jnp.fft.rfft(frames * window, n=win, axis=-1)
        power = jnp.abs(spec) ** 2  # (B, frames, win//2+1)
        fb = jnp.asarray(
            _mel_filterbank(sample_rate, win, n_mels), dtype=power.dtype
        )
        mel = power @ fb  # (B, frames, n_mels)
        log_mel = jnp.log10(jnp.maximum(mel, 1e-20))
        # STFT/log run in f32 (FFT requires it); return the caller's dtype
        return log_mel.transpose(1, 0, 2).astype(x.dtype)


def _mel_filterbank(sample_rate: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Triangular HTK-scale mel filterbank, (n_fft//2+1, n_mels)."""
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(_to_mel(0.0), _to_mel(sample_rate / 2), n_mels + 2)
    hz_pts = _to_hz(mel_pts)
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, ce, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(ce - lo, 1e-10)
        down = (hi - freqs) / max(hi - ce, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


class channel_averaging(nn.Module):
    """Fixed-weight multi-microphone average (neural_networks.py:702-717)."""

    options: Dict[str, Any]
    inp_dim: int

    @staticmethod
    def compute_out_dim(options, inp_dim) -> int:
        return 1

    @property
    def out_dim(self) -> int:
        return 1

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        weights = np.array(
            [float(v) for v in self.options["chavg_channelweights"].split(",")],
            dtype=np.float32,
        )
        weights = weights / weights.sum()
        assert x.shape[-1] == len(weights)
        return jnp.einsum(
            "tbc,c->tb", x, jnp.asarray(weights, dtype=x.dtype)
        )[..., None]
