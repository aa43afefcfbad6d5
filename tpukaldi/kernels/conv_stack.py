"""Whole-stack fused raw-waveform conv front-end (SincNet/CNN) kernel.

One Pallas program runs the ENTIRE conv stack for a batch of 200 ms
windows — layer 0 (C=1 conv K~129 + pool + bias + (time,filt) laynorm +
relu + dropout, the machinery of kernels/conv1d.py) followed by every
upper layer (C_in<=128 conv K<=8 + pool + bias + laynorm + relu +
dropout) — without the inter-layer activations ever leaving VMEM.

Why: at the TIMIT_SincNet_raw recipe shape the round-5 device trace put
the XLA-side layers 1-3 at ~1.0 ms/step — MORE than the fused layer-0
kernel pair — dominated by layout copies of the 64 MB layer-0 activation
(f32[128,1024,128], ~95 us each), conv dgrad fusions in 60-channel
layouts, and 4-D pool-backward broadcasts (f32[128,340,3,60], ~100 us).
All of that is bandwidth and relayout, not FLOPs: layers 1-3 are
~11 GFLOP/step against layer 0's ~13.  In-kernel, an upper-layer conv is
K sublane-shifted (ct,128)x(128,128) MXU matmuls read straight from a
VMEM scratch, pooling is the same row-merge lane trick layer 0 uses, and
the backward needs NO rotate ops at all (tap shifts live in the sublane
dim, so dX is K padded adds of (ct,128)@(128,128) products).  The
backward's dz input shrinks from the 64 MB layer-0 cotangent to the
~1.7 MB last-layer one.

Channels are zero-padded to the 128-lane width: conv weights, biases and
laynorm affine maps pad with zeros, which makes padded lanes exactly 0
through conv(+0 bias)->pool->laynorm(c=0, s floored)->relu->drop and
kills their gradients (upstream dX through zero weight rows is 0).  The
TPU vreg is 128 lanes wide either way — the pad costs no VPU work and
only idle MXU columns.

Reference semantics mirrored (cited for parity):
- conv stacks: /root/reference/neural_networks.py:1559-1665 (SincNet
  forward: conv -> max_pool1d -> laynorm((filt,time)) -> act -> drop),
  :1464-1556 (CNN);
- laynorm quirk: unbiased std + eps added to STD (not var), affine over
  the full (filt,time) map — models/cnn.py _CNNLayerNorm;
- dropout: inverted, applied after the activation;
- conv bias: its gradient is EXACTLY zero under the per-filter time
  laynorm (the mean subtraction makes a per-filter constant inert), so
  the backward emits exact zeros like conv1d.py's fused layer 0 does.

Dropout masks are regenerable counter-hash streams (conv1d._drop_mask)
salted per layer, so no mask residual crosses HBM and fwd/bwd agree
bit-exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv1d import (
    _colsum_f32,
    _drop_mask,
    _load_windows,
    _mul_dtype,
    _padded_x,
    _pool_scatter,
    _rolled,
    _w_split_rev,
    _window_conv,
    fused_ln_supported,
)

WBS = 8  # windows per program (fwd and bwd MUST agree: mask streams)
LANES = 128

# dropout-stream salt: the per-window id is offset per layer so each
# layer draws an independent stream from the same per-step seed
_SALT = 1 << 20


def _ceil(a: int, m: int) -> int:
    return ((a + m - 1) // m) * m


# geo entry per upper layer: (lin, K, pool, ct, M)
#   lin = input length (= previous layer's M), ct = M*pool (trimmed conv
#   span actually consumed by the pool), M = pooled length
def stack_geometry(inp_dim, len_filt, pools):
    geo = []
    cur = inp_dim
    for K, P in zip(len_filt, pools):
        lc = cur - K + 1
        M = lc // P
        geo.append((cur, K, P, M * P, M))
        cur = M
    return tuple(geo)


def stack_supported(len_filt, n_filt, inp_dim, pools) -> bool:
    """Geometry gate for the whole-stack fused path: layer 0 must satisfy
    the conv1d fused-ln constraints (lane-aligned filter count, rotate
    span), upper layers must fit the sublane-shift conv form."""
    if len(n_filt) < 2:
        return False
    if not fused_ln_supported(len_filt[0], n_filt[0], inp_dim, pools[0]):
        return False
    geo = stack_geometry(inp_dim, len_filt, pools)
    for i in range(1, len(n_filt)):
        if not (1 <= len_filt[i] <= 8 and 1 <= n_filt[i] <= LANES):
            return False
        if geo[i][4] < 1:
            return False
    return True


# ---- host-side packing -----------------------------------------------------

def _pack_upper_w(kernel):
    """(O, I, K) conv kernel -> (K*128, 128) f32, rows k*128 + c_in."""
    O, I, K = kernel.shape
    k3 = kernel.astype(jnp.float32).transpose(2, 1, 0)  # (K, I, O)
    pad = jnp.zeros((K, LANES, LANES), jnp.float32).at[:, :I, :O].set(k3)
    return pad.reshape(K * LANES, LANES)


def _unpack_upper_dw(dw, O, I, K):
    """(K*128, 128) grad -> (O, I, K)."""
    return dw.reshape(K, LANES, LANES)[:, :I, :O].transpose(2, 1, 0)


def _pad_map(m, rows):
    """(M, C) laynorm affine map -> (rows, 128) f32, zero padded."""
    M, C = m.shape
    out = jnp.zeros((rows, LANES), jnp.float32)
    return out.at[:M, :C].set(m.astype(jnp.float32))


def _pad_bias(b):
    out = jnp.zeros((8, LANES), jnp.float32)
    return out.at[0, : b.shape[0]].set(b.astype(jnp.float32))


# ---- shared in-kernel pieces -----------------------------------------------

def _pool_max_idx(acc, M, pool):
    """(>=M*pool, 128) conv block -> (max (M,128), first-match argmax).
    Row-merge reshape keeps pooling on aligned lane slices; the block is
    zero-padded up to a (8*pool)-row multiple first so the merge never
    splits a vreg row group (layer 1's ct=1020 is not 8-aligned)."""
    ct = M * pool
    ctp = _ceil(ct, 8 * pool)
    a = acc[:ct, :]
    if ctp > ct:
        a = jnp.pad(a, ((0, ctp - ct), (0, 0)))
    g = a.reshape(ctp // pool, pool * LANES)
    parts = [g[:, i * LANES:(i + 1) * LANES] for i in range(pool)]
    m = parts[0]
    for pt in parts[1:]:
        m = jnp.maximum(m, pt)
    idx = jnp.full((ctp // pool, LANES), pool - 1, jnp.int32)
    for i in range(pool - 2, -1, -1):
        idx = jnp.where(parts[i] == m, jnp.int32(i), idx)
    return m[:M, :], idx[:M, :]


def _ln_fwd(y, M, eps):
    """Reference laynorm moments: mean over time, unbiased std, eps on
    the std.  y (M, 128) -> (mu (1,128), s (1,128))."""
    mu = _colsum_f32(y) / M
    c = y - mu
    s = jnp.sqrt(_colsum_f32(c * c) / max(M - 1, 1))
    return mu, s


def _ln_bwd(dz, xh, s, eps, M, gt, mul_dtype):
    """d laynorm through z = xhat*g + b given dz AFTER the relu/drop
    gates: returns dy (grad wrt pre-norm pooled y).  Same formula as
    conv1d._fused_bwd_kernel (sum_t c = 0 exactly)."""
    r = 1.0 / (s + eps)
    c = xh * (s + eps)
    dzg = dz * gt
    cc = jnp.concatenate([dzg, dzg * c], axis=1)
    AB = jax.lax.dot_general(
        jnp.ones((1, cc.shape[0]), mul_dtype), cc.astype(mul_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    A, B = AB[:, :LANES], AB[:, LANES:]
    fac = (B * r * r) / (max(M - 1, 1) * jnp.maximum(s, 1e-30))
    return r * dzg - c * fac - (r / M) * A


def _upper_conv(h_ref, w_ref, K, ct, mul_dtype):
    """Valid C=128 conv as K sublane-shifted MXU matmuls:
    y[t] = sum_k h[t+k] @ W[k], h read from a VMEM scratch ref."""
    acc = None
    for k in range(K):
        part = jax.lax.dot_general(
            h_ref[k:k + ct, :].astype(mul_dtype),
            w_ref[k * LANES:(k + 1) * LANES, :].astype(mul_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc  # (ct, 128) f32


def _apply_relu_drop(z, drop, relu, seed_ref, wid, salt, M):
    if relu:
        z = jnp.maximum(z, 0.0)
    if drop > 0.0:
        mask = _drop_mask(seed_ref, wid + salt * _SALT, (M, LANES), drop)
        z = jnp.where(mask, z * (1.0 / (1.0 - drop)), 0.0)
    return z


# ---- forward kernel ---------------------------------------------------------

def _stack_fwd_kernel(*refs, K0, pool0, M0, geo, eps, relu, drops,
                      mul_dtype):
    NL = len(geo)
    (x_hbm, seed_ref, wrev_ref, wtail_ref, bias0_ref, gt0_ref,
     bt0_ref) = refs[:7]
    up = [refs[7 + 4 * i: 11 + 4 * i] for i in range(NL)]
    base = 7 + 4 * NL
    out_ref, idx0_ref, stats0_ref = refs[base:base + 3]
    upo = [refs[base + 3 + 2 * i: base + 5 + 2 * i] for i in range(NL)]
    scratch = refs[base + 3 + 2 * NL]
    sems = refs[base + 4 + 2 * NL]
    hs = list(refs[base + 5 + 2 * NL: base + 5 + 3 * NL])

    ct0 = M0 * pool0
    n = pl.program_id(0)
    _load_windows(x_hbm, scratch, sems, n, 0, ct0 + K0 - 1)

    def body(w, _):
        wid = n * WBS + w
        rolled = _rolled(scratch, w)
        acc = _window_conv(rolled, wrev_ref, wtail_ref, ct0, K0, mul_dtype)
        m, idx = _pool_max_idx(acc, M0, pool0)
        y = m + bias0_ref[0:1, :]
        mu, s = _ln_fwd(y, M0, eps)
        z = ((y - mu) * (1.0 / (s + eps))) * gt0_ref[:M0, :] + bt0_ref[:M0, :]
        z = _apply_relu_drop(z, drops[0], relu, seed_ref, wid, 0, M0)
        idx0_ref[w, :, :] = idx.astype(jnp.int8)
        stats0_ref[w, 0:1, :] = mu
        stats0_ref[w, 1:2, :] = s

        h = z
        for i, (lin, K, P, ct, M) in enumerate(geo):
            hs[i][:lin, :] = h
            accu = _upper_conv(hs[i], up[i][0], K, ct, mul_dtype)
            m, idx = _pool_max_idx(accu, M, P)
            y = m + up[i][1][0:1, :]
            mu, s = _ln_fwd(y, M, eps)
            z = ((y - mu) * (1.0 / (s + eps))) * up[i][2][:M, :] \
                + up[i][3][:M, :]
            z = _apply_relu_drop(z, drops[i + 1], relu, seed_ref, wid,
                                 i + 1, M)
            upo[i][0][w, :M, :] = idx.astype(jnp.int8)
            upo[i][1][w, 0:1, :] = mu
            upo[i][1][w, 1:2, :] = s
            h = z
        Mlast = geo[-1][4]
        out_ref[w, :Mlast, :] = h
        return 0

    jax.lax.fori_loop(0, WBS, body, 0)


# ---- backward kernel --------------------------------------------------------

def _stack_bwd_kernel(*refs, K0, pool0, M0, geo, eps, relu, drops,
                      mul_dtype):
    NL = len(geo)
    (dz_ref, idx0_ref, stats0_ref, seed_ref, w0_ref, wrev_ref, wtail_ref,
     bias0_ref, gt0_ref, bt0_ref) = refs[:10]
    up = [refs[10 + 6 * i: 16 + 6 * i] for i in range(NL)]
    x_hbm = refs[10 + 6 * NL]
    base = 11 + 6 * NL
    (dwrev_ref, dwtail_ref, dg0_ref, db0_ref, dxs_ref) = refs[base:base + 5]
    updo = [refs[base + 5 + 3 * i: base + 8 + 3 * i] for i in range(NL)]
    base2 = base + 5 + 3 * NL
    scratch = refs[base2]
    sems = refs[base2 + 1]
    hs = list(refs[base2 + 2: base2 + 2 + NL])       # layer-i INPUT acts
    xh0_ref = refs[base2 + 2 + NL]                   # layer-0 xhat
    xhs = list(refs[base2 + 3 + NL: base2 + 3 + 2 * NL])  # upper xhats

    ct0 = M0 * pool0
    n = pl.program_id(0)
    _load_windows(x_hbm, scratch, sems, n, 0, ct0 + K0 - 1)

    @pl.when(n == 0)
    def _():
        dwrev_ref[:, :] = jnp.zeros_like(dwrev_ref)
        dwtail_ref[:, :] = jnp.zeros_like(dwtail_ref)
        dg0_ref[:, :] = jnp.zeros_like(dg0_ref)
        db0_ref[:, :] = jnp.zeros_like(db0_ref)
        for i in range(NL):
            updo[i][0][:, :] = jnp.zeros_like(updo[i][0])
            updo[i][1][:, :] = jnp.zeros_like(updo[i][1])
            updo[i][2][:, :] = jnp.zeros_like(updo[i][2])

    def body(w, _):
        wid = n * WBS + w

        # ---- forward recompute: activations + xhats into scratch ----
        rolled = _rolled(scratch, w)
        acc = _window_conv(rolled, wrev_ref, wtail_ref, ct0, K0, mul_dtype)
        idx0 = idx0_ref[w, :, :].astype(jnp.int32)
        g = acc.reshape(M0, pool0 * LANES)
        y = jnp.zeros((M0, LANES), jnp.float32)
        for i in range(pool0):
            y = jnp.where(idx0 == i, g[:, i * LANES:(i + 1) * LANES], y)
        y = y + bias0_ref[0:1, :]
        mu0 = stats0_ref[w, 0:1, :]
        s0 = stats0_ref[w, 1:2, :]
        xh = (y - mu0) * (1.0 / (s0 + eps))
        xh0_ref[:, :] = xh
        z = xh * gt0_ref[:M0, :] + bt0_ref[:M0, :]
        h = _apply_relu_drop(z, drops[0], relu, seed_ref, wid, 0, M0)
        for i, (lin, K, P, ct, M) in enumerate(geo):
            hs[i][:lin, :] = h
            accu = _upper_conv(hs[i], up[i][0], K, ct, mul_dtype)
            idxi = up[i][4][w, :M, :].astype(jnp.int32)
            ctp = _ceil(ct, 8 * P)
            a = accu if ctp == ct else jnp.pad(accu,
                                               ((0, ctp - ct), (0, 0)))
            gg = a.reshape(ctp // P, P * LANES)[:M, :]
            y = jnp.zeros((M, LANES), jnp.float32)
            for j in range(P):
                y = jnp.where(idxi == j,
                              gg[:, j * LANES:(j + 1) * LANES], y)
            y = y + up[i][1][0:1, :]
            mu = up[i][5][w, 0:1, :]
            s = up[i][5][w, 1:2, :]
            xh = (y - mu) * (1.0 / (s + eps))
            xhs[i][:M, :] = xh
            if i < NL - 1:
                z = xh * up[i][2][:M, :] + up[i][3][:M, :]
                h = _apply_relu_drop(z, drops[i + 1], relu, seed_ref,
                                     wid, i + 1, M)

        # ---- reverse sweep through the upper layers ----
        d = dz_ref[w, :geo[-1][4], :].astype(jnp.float32)
        for i in range(NL - 1, -1, -1):
            lin, K, P, ct, M = geo[i]
            xh = xhs[i][:M, :]
            s = up[i][5][w, 1:2, :]
            if drops[i + 1] > 0.0:
                mask = _drop_mask(seed_ref, wid + (i + 1) * _SALT,
                                  (M, LANES), drops[i + 1])
                d = jnp.where(mask, d * (1.0 / (1.0 - drops[i + 1])), 0.0)
            if relu:
                z = xh * up[i][2][:M, :] + up[i][3][:M, :]
                d = jnp.where(z > 0.0, d, 0.0)
            updo[i][1][:M, :] += d * xh
            updo[i][2][:M, :] += d
            dy = _ln_bwd(d, xh, s, eps, M, up[i][2][:M, :], mul_dtype)
            idxi = up[i][4][w, :M, :].astype(jnp.int32)
            dconv = _pool_scatter(dy, idxi, P)  # (ct, 128)
            dconv_m = dconv.astype(mul_dtype)
            dh = None
            for k in range(K):
                updo[i][0][k * LANES:(k + 1) * LANES, :] += \
                    jax.lax.dot_general(
                        hs[i][k:k + ct, :].astype(mul_dtype), dconv_m,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                part = jax.lax.dot_general(
                    dconv_m,
                    up[i][0][k * LANES:(k + 1) * LANES, :]
                    .astype(mul_dtype),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                part = jnp.pad(part, ((k, lin - ct - k), (0, 0)))
                dh = part if dh is None else dh + part
            d = dh  # (lin, 128) == (M_{i-1}, 128)

        # ---- layer 0 (conv1d.py fused-bwd machinery) ----
        xh = xh0_ref[:, :]
        s0 = stats0_ref[w, 1:2, :]
        if drops[0] > 0.0:
            mask = _drop_mask(seed_ref, wid, (M0, LANES), drops[0])
            d = jnp.where(mask, d * (1.0 / (1.0 - drops[0])), 0.0)
        if relu:
            z = xh * gt0_ref[:M0, :] + bt0_ref[:M0, :]
            d = jnp.where(z > 0.0, d, 0.0)
        dg0_ref[:, :] += d * xh
        db0_ref[:, :] += d
        dy = _ln_bwd(d, xh, s0, eps, M0, gt0_ref[:M0, :], mul_dtype)
        idx0 = idx0_ref[w, :, :].astype(jnp.int32)
        dconv = _pool_scatter(dy, idx0, pool0)
        dconv_m = dconv.astype(mul_dtype)
        rolled = _rolled(scratch, w)
        p2r = rolled[:, 128:128 + ct0].astype(mul_dtype)
        dwrev_ref[:, :] += jax.lax.dot_general(
            p2r, dconv_m, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if K0 > 128:
            p2b = rolled[120:128, 256:256 + ct0].astype(mul_dtype)
            dwtail_ref[:, :] += jax.lax.dot_general(
                p2b, dconv_m, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        mt = jax.lax.dot_general(
            w0_ref[:, :].astype(mul_dtype), dconv_m,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (128, ct0)
        Wd = dxs_ref.shape[2]
        mt_p = jnp.pad(mt, ((0, 0), (0, Wd - ct0)))
        rolledm = pltpu.roll(mt_p, 0, axis=1, stride=1, stride_axis=0)
        dx = jax.lax.dot_general(
            jnp.ones((1, 128), mul_dtype), rolledm.astype(mul_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for k in range(128, K0):
            mrow = jax.lax.dot_general(
                wtail_ref[135 - k:136 - k, :].astype(jnp.float32), dconv,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            mrow_p = jnp.pad(mrow, ((0, 0), (0, Wd - ct0)))
            dx = dx + pltpu.roll(mrow_p, k, axis=1)
        dxs_ref[w, 0:1, :] = dx.astype(dxs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, WBS, body, 0)


# ---- jitted wrappers --------------------------------------------------------

def _vm(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def _bs(shape, blocked=False):
    if blocked:
        return pl.BlockSpec(shape, lambda n: (n,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec(shape, lambda n: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=(
    "K0", "pool0", "geo", "eps", "relu", "drops", "interpret", "precision"))
def _stack_fwd(x, w0, bias0, gt0, bt0, ups, seed, K0, pool0, geo, eps,
               relu, drops, interpret, precision):
    N, L = x.shape
    O = w0.shape[1]
    M0 = gt0.shape[0]
    ct0 = M0 * pool0
    NL = len(geo)
    mul = _mul_dtype(precision, jnp.float32)

    wrev, wtail = _w_split_rev(w0.astype(jnp.float32), jnp.float32)
    xp = _padded_x(x.astype(jnp.float32), 1, ct0, K0)
    Np = _ceil(N, WBS)
    if Np > N:
        xp = jnp.pad(xp, ((0, Np - N), (0, 0)))
    x3 = xp.reshape(Np, 1, xp.shape[1])
    b8 = _pad_bias(bias0)
    g0p = _pad_map(gt0, _ceil(M0, 8))
    b0p = _pad_map(bt0, _ceil(M0, 8))
    seed2 = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    Wp = 128 + ct0 + 128

    ins = [x3, seed2, wrev, wtail, b8, g0p, b0p]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 1), lambda n: (0, 0), memory_space=pltpu.SMEM),
        _bs((128, LANES)), _bs((8, LANES)), _bs((8, LANES)),
        _bs((_ceil(M0, 8), LANES)), _bs((_ceil(M0, 8), LANES)),
    ]
    for i, (lin, K, P, ct, M) in enumerate(geo):
        kernel, b, gm, bm = ups[i]
        ins += [_pack_upper_w(kernel), _pad_bias(b),
                _pad_map(gm, _ceil(M, 8)), _pad_map(bm, _ceil(M, 8))]
        in_specs += [_bs((K * LANES, LANES)), _bs((8, LANES)),
                     _bs((_ceil(M, 8), LANES)), _bs((_ceil(M, 8), LANES))]

    Ml = _ceil(geo[-1][4], 8)
    out_specs = [
        _bs((WBS, Ml, LANES), blocked=True),
        _bs((WBS, M0, LANES), blocked=True),
        _bs((WBS, 8, LANES), blocked=True),
    ]
    out_shape = [
        _vm((Np, Ml, LANES)),
        _vm((Np, M0, LANES), jnp.int8),
        _vm((Np, 8, LANES)),
    ]
    for (lin, K, P, ct, M) in geo:
        Mi = _ceil(M, 32)
        out_specs += [_bs((WBS, Mi, LANES), blocked=True),
                      _bs((WBS, 8, LANES), blocked=True)]
        out_shape += [_vm((Np, Mi, LANES), jnp.int8),
                      _vm((Np, 8, LANES))]

    scratch = [
        pltpu.VMEM((WBS, 1, Wp), jnp.float32),
        pltpu.SemaphoreType.DMA((WBS,)),
    ]
    for (lin, K, P, ct, M) in geo:
        scratch.append(pltpu.VMEM((_ceil(lin, 8), LANES), jnp.float32))

    res = pl.pallas_call(
        functools.partial(_stack_fwd_kernel, K0=K0, pool0=pool0, M0=M0,
                          geo=geo, eps=eps, relu=relu, drops=drops,
                          mul_dtype=mul),
        grid=(Np // WBS,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch, interpret=interpret,
    )(*ins)
    out, idx0, stats0 = res[0], res[1], res[2]
    upres = tuple((res[3 + 2 * i], res[4 + 2 * i]) for i in range(NL))
    return out[:N], idx0[:N], stats0[:N], tuple(
        (a[:N], b[:N]) for a, b in upres)


@functools.partial(jax.jit, static_argnames=(
    "K0", "pool0", "geo", "eps", "relu", "drops", "interpret", "precision"))
def _stack_bwd(x, dz, idx0, stats0, upres, seed, w0, bias0, gt0, bt0, ups,
               K0, pool0, geo, eps, relu, drops, interpret, precision):
    N, L = x.shape
    O = w0.shape[1]
    M0 = gt0.shape[0]
    ct0 = M0 * pool0
    NL = len(geo)
    mul = _mul_dtype(precision, jnp.float32)

    xp = _padded_x(x.astype(jnp.float32), 1, ct0, K0)
    Np = _ceil(N, WBS)
    Ml = _ceil(geo[-1][4], 8)
    dzp = jnp.zeros((Np, Ml, LANES), jnp.float32).at[
        :N, :dz.shape[1], :dz.shape[2]].set(dz.astype(jnp.float32))
    if Np > N:
        xp = jnp.pad(xp, ((0, Np - N), (0, 0)))
        idx0 = jnp.pad(idx0, ((0, Np - N), (0, 0), (0, 0)))
        stats0 = jnp.pad(stats0, ((0, Np - N), (0, 0), (0, 0)))
        upres = tuple(
            (jnp.pad(a, ((0, Np - N), (0, 0), (0, 0))),
             jnp.pad(b, ((0, Np - N), (0, 0), (0, 0))))
            for a, b in upres)
    x3 = xp.reshape(Np, 1, xp.shape[1])
    main = min(K0, 128)
    w128 = jnp.zeros((128, O), jnp.float32).at[:main, :].set(
        w0[:main, :].astype(jnp.float32))
    wrev, wtail = _w_split_rev(w0.astype(jnp.float32), jnp.float32)
    b8 = _pad_bias(bias0)
    g0p = _pad_map(gt0, _ceil(M0, 8))
    b0p = _pad_map(bt0, _ceil(M0, 8))
    seed2 = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    Wp = 128 + ct0 + 128
    Wd = ct0 + 128

    ins = [dzp, idx0, stats0, seed2, w128, wrev, wtail, b8, g0p, b0p]
    in_specs = [
        _bs((WBS, Ml, LANES), blocked=True),
        _bs((WBS, M0, LANES), blocked=True),
        _bs((WBS, 8, LANES), blocked=True),
        pl.BlockSpec((1, 1), lambda n: (0, 0), memory_space=pltpu.SMEM),
        _bs((128, LANES)), _bs((128, LANES)), _bs((8, LANES)),
        _bs((8, LANES)),
        _bs((_ceil(M0, 8), LANES)), _bs((_ceil(M0, 8), LANES)),
    ]
    for i, (lin, K, P, ct, M) in enumerate(geo):
        kernel, b, gm, bm = ups[i]
        Mi = _ceil(M, 32)
        ins += [_pack_upper_w(kernel), _pad_bias(b),
                _pad_map(gm, _ceil(M, 8)), _pad_map(bm, _ceil(M, 8)),
                upres[i][0], upres[i][1]]
        in_specs += [_bs((K * LANES, LANES)), _bs((8, LANES)),
                     _bs((_ceil(M, 8), LANES)), _bs((_ceil(M, 8), LANES)),
                     _bs((WBS, Mi, LANES), blocked=True),
                     _bs((WBS, 8, LANES), blocked=True)]
    ins.append(x3)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    out_specs = [_bs((128, LANES)), _bs((8, LANES)),
                 _bs((M0, LANES)), _bs((M0, LANES)),
                 _bs((WBS, 8, Wd), blocked=True)]
    out_shape = [_vm((128, LANES)), _vm((8, LANES)),
                 _vm((M0, LANES)), _vm((M0, LANES)),
                 _vm((Np, 8, Wd))]
    for (lin, K, P, ct, M) in geo:
        Mi = _ceil(M, 8)
        out_specs += [_bs((K * LANES, LANES)),
                      _bs((Mi, LANES)), _bs((Mi, LANES))]
        out_shape += [_vm((K * LANES, LANES)),
                      _vm((Mi, LANES)), _vm((Mi, LANES))]

    scratch = [
        pltpu.VMEM((WBS, 1, Wp), jnp.float32),
        pltpu.SemaphoreType.DMA((WBS,)),
    ]
    for (lin, K, P, ct, M) in geo:
        scratch.append(pltpu.VMEM((_ceil(lin, 8), LANES), jnp.float32))
    scratch.append(pltpu.VMEM((M0, LANES), jnp.float32))  # xh0
    for (lin, K, P, ct, M) in geo:
        scratch.append(pltpu.VMEM((_ceil(M, 8), LANES), jnp.float32))

    res = pl.pallas_call(
        functools.partial(_stack_bwd_kernel, K0=K0, pool0=pool0, M0=M0,
                          geo=geo, eps=eps, relu=relu, drops=drops,
                          mul_dtype=mul),
        grid=(Np // WBS,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch, interpret=interpret,
    )(*ins)
    dwrev, dwtail, dg0, db0, dxs = res[:5]
    updw = [res[5 + 3 * i: 8 + 3 * i] for i in range(NL)]

    main = min(K0, 128)
    dw0 = jnp.flip(dwrev[128 - main:, :], axis=0)
    if K0 > 128:
        dw0 = jnp.concatenate(
            [dw0, dwtail[135 - jnp.arange(128, K0), :]], axis=0)
    dxs = dxs[:N, 0, :]
    dxf = jnp.zeros((N, xp.shape[1] + 128), jnp.float32)
    dxf = dxf.at[:, :Wd].add(dxs)
    dups = []
    for i, (lin, K, P, ct, M) in enumerate(geo):
        kernel, b, gm, bm = ups[i]
        Oc, Ic, Kc = kernel.shape
        dups.append((
            _unpack_upper_dw(updw[i][0], Oc, Ic, Kc).astype(kernel.dtype),
            jnp.zeros_like(b),
            updw[i][1][:M, :gm.shape[1]].astype(gm.dtype),
            updw[i][2][:M, :bm.shape[1]].astype(bm.dtype),
        ))
    return (dxf[:, :L].astype(x.dtype), dw0.astype(w0.dtype),
            jnp.zeros_like(bias0), dg0.astype(gt0.dtype),
            db0.astype(bt0.dtype), tuple(dups))


# ---- public custom-vjp op ----------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def conv_stack_fused(x, w0, bias0, gt0, bt0, ups, seed, pools, eps,
                     relu: bool, drops, interpret: bool = False,
                     precision: str = "default"):
    """Fused whole-stack raw-waveform conv front-end.

    x (N, L) samples; w0 (K0, O0) layer-0 filters (O0 lane-aligned);
    bias0 (O0,); gt0/bt0 (M0, O0) layer-0 laynorm affine (time-major);
    ups: per upper layer (kernel (O, I, K), bias (O,), gamma (M, O),
    beta (M, O)) with gamma/beta time-major; seed: int32 dropout seed.
    Static: pools (one per layer), eps, relu, drops (one per layer).
    Returns (N, M_last, O_last).  Gradients flow to x, w0, gt0/bt0 and
    every upper kernel/gamma/beta; conv-bias grads are exact zeros
    (laynorm-inert, see module docstring)."""
    K0 = w0.shape[0]
    M0 = gt0.shape[0]
    geo = stack_geometry(M0, tuple(u[0].shape[2] for u in ups),
                         tuple(pools[1:]))
    out, _, _, _ = _stack_fwd(x, w0, bias0, gt0, bt0, ups, seed, K0,
                              pools[0], geo, eps, relu, tuple(drops),
                              interpret, precision)
    Mlast, Olast = geo[-1][4], ups[-1][0].shape[0]
    return out[:, :Mlast, :Olast]


def _stack_vjp_fwd(x, w0, bias0, gt0, bt0, ups, seed, pools, eps, relu,
                   drops, interpret, precision):
    K0 = w0.shape[0]
    M0 = gt0.shape[0]
    geo = stack_geometry(M0, tuple(u[0].shape[2] for u in ups),
                         tuple(pools[1:]))
    out, idx0, stats0, upres = _stack_fwd(
        x, w0, bias0, gt0, bt0, ups, seed, K0, pools[0], geo, eps, relu,
        tuple(drops), interpret, precision)
    Mlast, Olast = geo[-1][4], ups[-1][0].shape[0]
    return out[:, :Mlast, :Olast], (x, w0, bias0, gt0, bt0, ups, seed,
                                    idx0, stats0, upres)


def _stack_vjp_bwd(pools, eps, relu, drops, interpret, precision, res, dz):
    x, w0, bias0, gt0, bt0, ups, seed, idx0, stats0, upres = res
    K0 = w0.shape[0]
    M0 = gt0.shape[0]
    geo = stack_geometry(M0, tuple(u[0].shape[2] for u in ups),
                         tuple(pools[1:]))
    dx, dw0, dbias0, dg0, db0, dups = _stack_bwd(
        x, dz, idx0, stats0, upres, seed, w0, bias0, gt0, bt0, ups, K0,
        pools[0], geo, eps, relu, tuple(drops), interpret, precision)
    dseed = np.zeros(np.shape(seed), jax.dtypes.float0)
    return dx, dw0, dbias0, dg0, db0, tuple(dups), dseed


conv_stack_fused.defvjp(_stack_vjp_fwd, _stack_vjp_bwd)
