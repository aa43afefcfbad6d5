"""Fused 1-D conv + max-pool Pallas kernel for the raw-waveform front-ends.

The SincNet/CNN recipes' layer 0 is a single-input-channel valid conv over
3200-sample windows (K=129, 128 filters at TIMIT_SincNet_raw.cfg shapes,
reference neural_networks.py:1559-1665) followed by max_pool1d — half the
FLOPs of the whole conv stack.  XLA's conv emitter runs it well below
speed-of-light on a v5e because the C=1 implicit-GEMM tiles poorly; this
kernel lowers it explicitly:

- grid (N, time-blocks); each program DMAs its overlapping input window
  HBM->VMEM and builds the shifted-slice patch matrix IN VMEM (never
  materialized in HBM — the explicit-im2col alternative is a 129x-expanded
  ~200 MB HBM round trip at recipe shapes).  Mosaic cannot concat K slices
  at K distinct lane offsets, and its strided rotate caps per-vreg shifts
  at the 128-lane vreg width, so the patch matrix is built with ONE
  small-shift strided rotate in REVERSED tap order (row j right-rolled by
  j+1, read through a 128-aligned column window, gives xb[127-j :
  127-j+ct]); the weights are pre-reversed OUTSIDE the kernel, which makes
  the reversal free,
- one full-depth MXU pass for taps 0..127; tap 128 (odd sinc length) is a
  VPU rank-1 epilogue — another systolic pass would stream all ct rows
  again for a 1/128-occupied contraction,
- max-pool (torch semantics: stride == kernel, floor) fused on the block
  with the argmax index saved as an int8 residual,
- custom VJP: the backward rebuilds the patch block in VMEM, scatters the
  pooled cotangent through the saved argmax, accumulates dW across the
  sequential grid, and computes dX (the recipes apply a LEARNABLE input
  laynorm before layer 0, so the input cotangent is live) as one MXU
  contraction over the filter axis followed by a strided rotate that turns
  the anti-diagonal sums into a single sublane reduction, staged per block
  and folded outside the kernel to keep block writes conflict-free.

Supported: single input channel, 1 <= K <= 129, stride 1, valid padding —
exactly the raw-waveform layer-0 shapes.  Deeper layers (C>1, contraction
K*C = 300/180 at recipe shapes) stay on the XLA conv emitter, which tiles
those fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_K = 129  # one 128-tap MXU pass + one rank-1 epilogue tap


def kernel_supported(K: int, n_filt: int) -> bool:
    """Shape envelope the Mosaic lowering actually supports.  Beyond the
    K <= 129 contract, the fused pool's row-merge reshape (ct, O) ->
    (bt, pool*O) is a pure lane concat only when O is a 128-lane
    multiple; Mosaic rejects it otherwise ("infer-vector-layout:
    unsupported shape cast" at O=16 — caught by the round-4 e2e TPU
    drive).  Both raw-waveform recipes run 128 layer-0 filters, so the
    guard costs nothing at recipe shapes; everything else falls back to
    the XLA conv emitter (models/cnn.py dispatch)."""
    return 1 <= K <= MAX_K and n_filt % 128 == 0


def _choose_block(lp: int, pool: int) -> int:
    """Pooled rows per grid block.  Multi-block grids need every block's
    conv-row span (bt*pool) to be a 128-lane multiple: the per-block HBM
    DMA starts at b*ct, and Mosaic requires 128-aligned lane offsets."""
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if lp % cand == 0 and (cand * pool) % 128 == 0:
            return cand
    return lp  # single block: start offset 0 is trivially aligned


WB = 8  # windows per program: amortizes DMA latency + grid-step overhead
WB_FUSED_BWD = 8  # fused laynorm backward windows/program (fori-carried
# dgamma/dbeta accumulators exceeded the 16 MB VMEM stack at 8 and
# measured neutral at 4, so accumulation stays on the refs)
# (measured: at 1 window/program the per-program overhead alone was
# ~6 us x 256 programs = 1.5 ms — as much as the whole conv math)


def _load_windows(x_hbm, scratch, sems, n, start, width):
    """DMA x[n*nw + w, start:start+width] HBM->VMEM scratch row w for all
    nw windows CONCURRENTLY (start all, then wait all — one latency),
    where nw = scratch rows (WB for the conv kernels, WB_FUSED_BWD for
    the fused laynorm backward).  Zero the scratch tail so taps past the
    window read finite values (they meet zero weights, and 0 * garbage
    could be NaN)."""
    nw = scratch.shape[0]
    width = ((width + 127) // 128) * 128  # Mosaic: 128-aligned DMA width
    dmas = []
    for w in range(nw):
        dma = pltpu.make_async_copy(
            x_hbm.at[n * nw + w, :, pl.ds(start, width)],
            scratch.at[w, :, :width], sems.at[w])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()
    scratch[:, :, width:] = jnp.zeros(
        (nw, 1, scratch.shape[2] - width), scratch.dtype)


def _rolled(scratch, w):
    """Strided rotate of scratch row w broadcast over 128 rows (row j
    right-rolled by j+1 — max shift 128, within Mosaic's per-vreg limit).
    Read through the 128-aligned column window [128 : 128+ct) it is the
    patch matrix in REVERSED tap order (row j = xb[127-j : 127-j+ct]);
    through [256 : 256+ct) rows 120..127 cover taps 135..128.  `w` may be
    traced (fori_loop index): the leading scratch dim is untiled.
    NB a bf16 rotate (casting before the roll to halve the vreg traffic)
    is NOT available: Mosaic's tpu.dynamic_rotate is 32-bit-only
    ("Rotate with non-32-bit data" — measured round 4), so the cast to
    the multiply dtype must happen after the rotate."""
    Wp = scratch.shape[2]
    segb = jnp.broadcast_to(scratch[w, 0:1, :], (128, Wp))
    return pltpu.roll(segb, 1, axis=1, stride=1, stride_axis=0)


def _patches_rev(scratch, w, ct):
    return _rolled(scratch, w)[:, 128:128 + ct]


def _fwd_kernel(x_hbm, wrev_ref, wtail_ref, y_ref, idx_ref, scratch, sems,
                *, K, pool, bt, mul_dtype):
    """One (n, b) program: pooled rows [b*bt, (b+1)*bt) of WB windows."""
    ct = bt * pool
    n, b = pl.program_id(0), pl.program_id(1)
    _load_windows(x_hbm, scratch, sems, n, b * ct, ct + K - 1)

    def body(w, _):
        # fori_loop (not a python unroll): an 8x-unrolled body blows
        # Mosaic's compile time past the driver budget
        # bf16 multiply / f32 accumulate = XLA's DEFAULT matmul precision
        # on TPU (the same arithmetic the lax.conv paths run); f32
        # operands would lower to the 3-pass decomposition and triple the
        # MXU time
        rolled = _rolled(scratch, w)
        p2r = rolled[:, 128:128 + ct]  # (128, ct), row j = tap 127-j
        acc = jax.lax.dot_general(
            p2r.astype(mul_dtype), wrev_ref[:, :].astype(mul_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (ct, O)
        if K > 128:
            # taps 128..135 (only those < K carry nonzero weights): one
            # 8-deep MXU pass over the second aligned window of the SAME
            # rotate — rows 120..127 = taps 135..128
            p2b = rolled[120:128, 256:256 + ct]
            acc = acc + jax.lax.dot_general(
                p2b.astype(mul_dtype), wtail_ref[:, :].astype(mul_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # pool via a row-merge reshape — 3 consecutive rows' lanes become
        # one row of pool*O lanes, and the pool reduces over ALIGNED lane
        # slices.  (The "natural" (bt, pool, O) reshape forces a pool-3
        # sublane retile that measured ~1.8 ms/step with max+argmax.)
        O = acc.shape[-1]
        g = acc.reshape(bt, pool * O)
        parts = [g[:, i * O:(i + 1) * O] for i in range(pool)]
        m = parts[0]
        for pt in parts[1:]:
            m = jnp.maximum(m, pt)
        # first-match argmax (torch semantics) by equality against the
        # max; int32 intermediates — an i1-mask select into int8 hits a
        # (8,128)->(32,128) relayout Mosaic refuses
        idx = jnp.full((bt, O), pool - 1, jnp.int32)
        for i in range(pool - 2, -1, -1):
            idx = jnp.where(parts[i] == m, jnp.int32(i), idx)
        y_ref[w, :, :] = m.astype(y_ref.dtype)
        idx_ref[w, :, :] = idx.astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, WB, body, 0)


def _pool_scatter(dy, idx, pool):
    """Scatter the pooled cotangent through the saved argmax: (M, O) ->
    (M*pool, O).  Built as pool 2-D lane-slice selects + ONE lane concat +
    the row-split shape cast — the exact inverse of the forward's
    row-merge pooling trick.  (The 'natural' 3-D route — broadcasted_iota
    (M, pool, O) select + reshape — forces the same pool-wide sublane
    retile the forward comment documents at ~1.8 ms/step; this form keeps
    every op on (M, O) vregs.)"""
    M, O = dy.shape
    parts = [jnp.where(idx == i, dy, 0.0) for i in range(pool)]
    return jnp.concatenate(parts, axis=1).reshape(M * pool, O)


def _bwd_kernel(dy_ref, idx_ref, w_ref, wtail_ref, x_hbm, dwrev_ref,
                dwtail_ref, dxs_ref, scratch, sems, *, K, pool, bt,
                mul_dtype):
    """Accumulate reversed-order dW plus the tail tap over the sequential
    grid, and stage each window's dX (overlaps folded by caller)."""
    ct = bt * pool
    n, b = pl.program_id(0), pl.program_id(1)
    _load_windows(x_hbm, scratch, sems, n, b * ct, ct + K - 1)

    is_first = jnp.logical_and(n == 0, b == 0)

    @pl.when(is_first)
    def _():
        dwrev_ref[:, :] = jnp.zeros_like(dwrev_ref)
        dwtail_ref[:, :] = jnp.zeros_like(dwtail_ref)

    def body(w, _):
        dy = dy_ref[w, :, :].astype(jnp.float32)  # (bt, O)
        idx = idx_ref[w, :, :].astype(jnp.int32)  # (bt, O)

        dconv = _pool_scatter(dy, idx, pool)  # (ct, O)
        dconv_m = dconv.astype(mul_dtype)

        rolled = _rolled(scratch, w)
        p2r = rolled[:, 128:128 + ct].astype(mul_dtype)
        dw_blk = jax.lax.dot_general(
            p2r, dconv_m,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (128, O), row j = d w[127-j]
        dwrev_ref[:, :] += dw_blk
        if K > 128:  # tail taps: 8-row pass, rows r = taps 135-r
            p2b = rolled[120:128, 256:256 + ct].astype(mul_dtype)
            dwtail_ref[:, :] += jax.lax.dot_general(
                p2b, dconv_m,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # dX: dx[s] = sum_k dconv[s-k, :] . w[k, :].  One MXU contraction
        # over O gives M (rows = taps 0..127); rolling row k RIGHT by k
        # (shift 0, stride 1 — within the vreg limit) turns the
        # anti-diagonal sums into a 128-row column sum, which runs as a
        # second MXU pass (ones-row contraction) — the VPU sublane
        # tree-reduce it replaces was the bwd kernel's hottest op
        # (measured round 4); tap 128 adds a constant 128-lane rotation.
        mt = jax.lax.dot_general(
            w_ref[:, :].astype(mul_dtype), dconv_m,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (128, ct), row = tap
        Wd = dxs_ref.shape[2]
        mt_p = jnp.pad(mt, ((0, 0), (0, Wd - ct)))
        rolled = pltpu.roll(mt_p, 0, axis=1, stride=1, stride_axis=0)
        dx = jax.lax.dot_general(
            jnp.ones((1, 128), mul_dtype), rolled.astype(mul_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, Wd) — column sums via the systolic array
        for k in range(128, K):  # wtail rows are tap 135-r
            mrow = jax.lax.dot_general(
                wtail_ref[135 - k:136 - k, :].astype(jnp.float32), dconv,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, ct)
            mrow_p = jnp.pad(mrow, ((0, 0), (0, Wd - ct)))
            dx = dx + pltpu.roll(mrow_p, k, axis=1)
        # the stage block spans all n_blk rows (a 1-row block would
        # violate the sublane tiling); write only this program's row
        dxs_ref[w, pl.ds(b, 1), :] = dx.astype(dxs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, WB, body, 0)


def _w_split_rev(w, dtype):
    """(wrev (128, O) with row j = w[127-j] (zero rows for taps >= K),
    wtail (8, O) holding taps 128.. in rows 0..)."""
    K, O = w.shape
    main = min(K, 128)
    # tap t lives at row 127-t: taps 0..main-1 -> rows 127 down to 128-main
    wrev = jnp.zeros((128, O), dtype)
    wrev = wrev.at[128 - main:, :].set(
        jnp.flip(w[:main, :], axis=0).astype(dtype))
    # tail rows r = tap 135-r (matches rotate rows 120..127 read through
    # the second aligned window); only taps < K are nonzero
    wtail = jnp.zeros((8, O), dtype)
    if K > 128:
        wtail = wtail.at[135 - jnp.arange(128, K), :].set(
            w[128:, :].astype(dtype))
    return wrev, wtail


def _padded_x(x, n_blk, ct, K):
    L = x.shape[1]
    # last block's DMA width is rounded up to a 128-lane multiple
    need = (n_blk - 1) * ct + ((ct + K - 1 + 127) // 128) * 128
    if need > L:
        x = jnp.pad(x, ((0, 0), (0, need - L)))
    return x


def _mul_dtype(precision, x_dtype):
    """"default" = bf16 multiply / f32 accumulate — the SAME arithmetic
    XLA's DEFAULT matmul precision runs on TPU (one systolic pass);
    "highest" keeps the operand dtype (f32 lowers to the 3-pass
    decomposition — used by the CPU-side exactness tests)."""
    return x_dtype if precision == "highest" else jnp.bfloat16


@functools.partial(jax.jit, static_argnames=("pool", "interpret",
                                             "precision"))
def _conv_pool_fwd(x, w, pool: int, interpret: bool = False,
                   precision: str = "default"):
    N, L = x.shape
    K, O = w.shape
    if K > MAX_K:
        raise ValueError(f"conv1d_pool supports K <= {MAX_K}, got {K}")
    Lp = (L - K + 1) // pool
    bt = _choose_block(Lp, pool)
    ct = bt * pool
    n_blk = Lp // bt
    wrev, wtail = _w_split_rev(w, w.dtype)
    x = _padded_x(x, n_blk, ct, K)
    Np = ((N + WB - 1) // WB) * WB  # window-batched grid
    if Np > N:
        x = jnp.pad(x, ((0, Np - N), (0, 0)))
    # (Np, 1, L): an integer index drops the batch dim in the DMA source —
    # a length-1 sublane *slice* of a tiled HBM ref is rejected by Mosaic
    x3 = x.reshape(Np, 1, x.shape[1])
    # scratch: 128-aligned read window + ct + 128-tap reach
    Wp = 128 + ct + 128

    y, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K, pool=pool, bt=bt,
                          mul_dtype=_mul_dtype(precision, x.dtype)),
        grid=(Np // WB, n_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((128, O), lambda n, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, O), lambda n, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((WB, bt, O), lambda n, b: (n, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, bt, O), lambda n, b: (n, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Lp, O), x.dtype),
            jax.ShapeDtypeStruct((Np, Lp, O), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((WB, 1, Wp), x.dtype),
            pltpu.SemaphoreType.DMA((WB,)),
        ],
        interpret=interpret,
    )(x3, wrev, wtail)
    return y[:N], idx[:N]


@functools.partial(jax.jit, static_argnames=("K", "pool", "interpret",
                                             "precision"))
def _conv_pool_bwd(x, dy, idx, w, K: int, pool: int,
                   interpret: bool = False, precision: str = "default"):
    N, L = x.shape
    _, Lp, O = dy.shape
    bt = _choose_block(Lp, pool)
    ct = bt * pool
    n_blk = Lp // bt
    xp = _padded_x(x, n_blk, ct, K)
    Np = ((N + WB - 1) // WB) * WB
    if Np > N:
        # zero-padded windows contribute zero dW (their dy is zero-padded)
        xp = jnp.pad(xp, ((0, Np - N), (0, 0)))
        dy = jnp.pad(dy, ((0, Np - N), (0, 0), (0, 0)))
        idx = jnp.pad(idx, ((0, Np - N), (0, 0), (0, 0)))
    xp3 = xp.reshape(Np, 1, xp.shape[1])
    main = min(K, 128)
    w128 = jnp.zeros((128, O), jnp.float32).at[:main, :].set(
        w[:main, :].astype(jnp.float32))
    _, wtail = _w_split_rev(w, jnp.float32)
    Wp = 128 + ct + 128
    Wd = ct + 128  # dx stage width: ct + max tap reach

    dwrev, dwtail, dx_stage = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K, pool=pool, bt=bt,
                          mul_dtype=_mul_dtype(precision, x.dtype)),
        grid=(Np // WB, n_blk),
        in_specs=[
            pl.BlockSpec((WB, bt, O), lambda n, b: (n, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, bt, O), lambda n, b: (n, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, O), lambda n, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, O), lambda n, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((128, O), lambda n, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, O), lambda n, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, n_blk, Wd), lambda n, b: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((128, O), jnp.float32),
            jax.ShapeDtypeStruct((8, O), jnp.float32),
            jax.ShapeDtypeStruct((Np, n_blk, Wd), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((WB, 1, Wp), x.dtype),
            pltpu.SemaphoreType.DMA((WB,)),
        ],
        interpret=interpret,
    )(dy, idx, w128, wtail, xp3)
    dx_stage = dx_stage[:N]

    # dwrev row j = d w[127-j]; taps 0..main-1 occupy rows 127..128-main
    dw = jnp.flip(dwrev[128 - main:, :], axis=0)
    if K > 128:  # dwtail row r accumulated tap 135-r
        dw = jnp.concatenate(
            [dw, dwtail[135 - jnp.arange(128, K), :]], axis=0)
    # fold the staged per-block windows (up-to-128-sample overlaps) into dX
    dx = jnp.zeros((N, xp.shape[1] + 128), jnp.float32)
    for b in range(n_blk):
        dx = dx.at[:, b * ct: b * ct + Wd].add(dx_stage[:, b, :])
    return dw.astype(x.dtype), dx[:, :L].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv1d_pool(x, w, pool: int, interpret: bool = False,
                precision: str = "default"):
    """Fused valid 1-D conv (C=1) + max-pool: x (N, L), w (K, O) ->
    (N, (L-K+1)//pool, O).  Gradients flow to both `w` and `x` (the input
    may carry a learnable input-normalization upstream).  `interpret=True`
    runs the kernels in interpreter mode off-TPU (tests); production
    dispatch gates on the backend (models/cnn.py)."""
    y, _ = _conv_pool_fwd(x, w, pool=pool, interpret=interpret,
                          precision=precision)
    return y


def _bwd_impl() -> str:
    """TPUKALDI_CONV_BWD: 'pallas' (default) keeps the hand-written
    reverse kernels; 'xla' composes the backward from jax.vjp of the XLA
    reference forward instead.  MEASURED at recipe shapes inside the full
    K=8-fused SincNet step: pallas-bwd 4.19 ms/step vs xla-bwd 10.75 —
    XLA's transpose convs are 2.6x slower in context.  (A scan-invariant
    microbenchmark initially suggested the opposite because XLA hoisted
    the whole gradient out of the timing scan — kept here as a warning:
    thread a carry through anything you time under lax.scan.)"""
    import os

    return os.environ.get("TPUKALDI_CONV_BWD", "pallas").strip().lower()


def _xla_conv_pool(x, w, pool, precision="default"):
    """Plain-XLA reference of the fused forward: valid C=1 conv + max-pool
    (torch floor semantics).  Used by the XLA-composed backward and as the
    gradient-parity reference."""
    N, L = x.shape
    K, O = w.shape
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None
    c = jax.lax.conv_general_dilated(
        x[:, :, None], w[:, None, :], (1,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), precision=prec,
    )
    M = (L - K + 1) // pool
    return c[:, : M * pool].reshape(N, M, pool, O).max(axis=2)


def _conv_pool_vjp_fwd(x, w, pool, interpret, precision):
    y, idx = _conv_pool_fwd(x, w, pool=pool, interpret=interpret,
                            precision=precision)
    # residuals carry w (not ints: an int in the residual pytree would be
    # promoted to a traced leaf and poison the static K)
    return y, (x, idx, w)


def _conv_pool_vjp_bwd(pool, interpret, precision, res, dy):
    x, idx, w = res
    if not interpret and _bwd_impl() == "xla":
        _, vjp = jax.vjp(
            lambda xx, ww: _xla_conv_pool(xx, ww, pool, precision), x, w
        )
        return vjp(dy)
    dw, dx = _conv_pool_bwd(x, dy, idx, w, K=w.shape[0], pool=pool,
                            interpret=interpret, precision=precision)
    return dx, dw


conv1d_pool.defvjp(_conv_pool_vjp_fwd, _conv_pool_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused conv + max-pool + bias + (filt,time) laynorm + act for layer 0
# ---------------------------------------------------------------------------
#
# The raw-waveform recipes follow layer 0's conv+pool with a per-layer
# LayerNorm over TIME per (window, filter) and a relu
# (neural_networks.py:1510-1512 via models/cnn.py _CNNLayerNorm) — on the
# round-4 device trace the XLA elementwise passes around the 64 MB pooled
# activation (laynorm fwd + bwd reductions, relu) were as expensive as
# the conv kernel itself.  The moments are WINDOW-LOCAL (mean/unbiased-std
# over the Lp pooled rows per filter), so one whole-window program can run
# the entire chain in VMEM:
#
# - fwd: conv (the same reversed-tap rotate + MXU passes as conv1d_pool)
#   -> pool+argmax -> +bias -> moments (f32 ones-row dots — the 3-pass
#   f32 MXU decomposition keeps laynorm statistics at f32 precision) ->
#   normalize with the reference's (std + eps) quirk -> gamma/beta (full
#   (time, filt) affine map resident in VMEM) -> act.  Saves the separate
#   XLA laynorm/relu round trips over the 64 MB activation.
# - bwd: recomputes the pooled pre-norm activation from x + the saved
#   argmax (cheaper than a 64 MB residual round trip), runs the laynorm
#   backward per window with two f32 ones-row dots (sum(dz*g),
#   sum(dz*g*c)), then the same pool-scatter + dW/dX passes as
#   _bwd_kernel; accumulates dgamma/dbeta across the sequential grid like
#   dW.  `s` is floored at 1e-30 so zero-variance windows (grid padding)
#   contribute exact zeros instead of NaN.
#
# Bias note: the laynorm mean makes the conv bias mathematically inert
# (it cancels in x - mean(x)), so its Jacobian is exactly zero; dbias is
# emitted as that analytic zero (the composed autodiff path produces
# ~1e-7 fp noise for the same quantity).


def fused_ln_supported(K: int, n_filt: int, L: int, pool: int) -> bool:
    """Geometry the fused whole-window lowering supports: conv1d_pool's
    envelope plus a 128-lane-aligned conv extent (one block per window)
    and a sublane-aligned pooled length."""
    if not kernel_supported(K, n_filt):
        return False
    Lp = (L - K + 1) // pool
    return Lp >= 8 and Lp % 8 == 0 and (Lp * pool) % 128 == 0


def _window_conv(rolled, wrev_ref, wtail_ref, ct, K, mul_dtype):
    """(ct, O) f32 conv block from a window's rotated patch matrix."""
    acc = jax.lax.dot_general(
        rolled[:, 128:128 + ct].astype(mul_dtype),
        wrev_ref[:, :].astype(mul_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if K > 128:
        acc = acc + jax.lax.dot_general(
            rolled[120:128, 256:256 + ct].astype(mul_dtype),
            wtail_ref[:, :].astype(mul_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _colsum_f32(x):
    """(1, cols) column sums via an f32 ones-row dot (3-pass MXU: keeps
    laynorm moments at f32 precision, unlike the bf16 data passes)."""
    return jax.lax.dot_general(
        jnp.ones((1, x.shape[0]), jnp.float32), x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _drop_mask(seed_ref, window_id, shape, drop):
    """Regenerable inverted-dropout mask from a counter-based hash
    (murmur3 fmix32 over element id ^ step seed ^ window id), so the
    backward rebuilds the IDENTICAL mask without storing it — no 64 MB
    mask residual crosses HBM and no threefry rematerialization (the
    round-4 device trace put mask generation at ~0.6 ms/step for the
    separate-dropout path; this is ~8 VPU int ops per element).  Pure jnp,
    so the interpreter-mode CPU tests run the same bit stream as the TPU
    kernel.  Keep-probability quantized to 1/2^32."""
    M, O = shape
    eid = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(O)
           + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    # int32 -> uint32 must be astype (mod-2^32 convert): Mosaic's
    # tpu.bitcast is vector-only and rejects the SMEM scalar
    seed = seed_ref[0, 0].astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    wid = window_id.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
    h = eid * jnp.uint32(0xC2B2AE3D) ^ seed ^ wid
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    t = jnp.uint32(min(int(round((1.0 - drop) * 2.0 ** 32)), 2 ** 32 - 1))
    return h < t


def _fused_fwd_kernel(x_hbm, seed_ref, wrev_ref, wtail_ref, bias_ref,
                      gt_ref, bt_ref, out_ref, idx_ref, stats_ref, scratch,
                      sems, *, K, pool, M, eps, relu, drop, mul_dtype):
    ct = M * pool
    n = pl.program_id(0)
    _load_windows(x_hbm, scratch, sems, n, 0, ct + K - 1)

    def body(w, _):
        rolled = _rolled(scratch, w)
        acc = _window_conv(rolled, wrev_ref, wtail_ref, ct, K, mul_dtype)
        O = acc.shape[-1]
        g = acc.reshape(M, pool * O)
        parts = [g[:, i * O:(i + 1) * O] for i in range(pool)]
        m = parts[0]
        for pt in parts[1:]:
            m = jnp.maximum(m, pt)
        idx = jnp.full((M, O), pool - 1, jnp.int32)
        for i in range(pool - 2, -1, -1):
            idx = jnp.where(parts[i] == m, jnp.int32(i), idx)
        y = m + bias_ref[0:1, :]
        mu = _colsum_f32(y) / M  # (1, O)
        c = y - mu
        s = jnp.sqrt(_colsum_f32(c * c) / max(M - 1, 1))  # (1, O)
        r = 1.0 / (s + eps)
        z = (c * r) * gt_ref[:, :] + bt_ref[:, :]
        if relu:
            z = jnp.maximum(z, 0.0)
        if drop > 0.0:
            mask = _drop_mask(seed_ref, n * WB + w, (M, O), drop)
            z = jnp.where(mask, z * (1.0 / (1.0 - drop)), 0.0)
        out_ref[w, :, :] = z.astype(out_ref.dtype)
        idx_ref[w, :, :] = idx.astype(jnp.int8)
        stats_ref[w, 0:1, :] = mu
        stats_ref[w, 1:2, :] = s
        return 0

    jax.lax.fori_loop(0, WB, body, 0)


def _fused_bwd_kernel(dz_ref, idx_ref, stats_ref, seed_ref, w_ref, wrev_ref,
                      wtail_ref, bias_ref, gt_ref, bt_ref, x_hbm,
                      dwrev_ref, dwtail_ref, dg_ref, db_ref, dbias_ref,
                      dxs_ref, scratch, sems, *, K, pool, M, eps, relu,
                      drop, mul_dtype):
    ct = M * pool
    n = pl.program_id(0)
    _load_windows(x_hbm, scratch, sems, n, 0, ct + K - 1)

    @pl.when(n == 0)
    def _():
        dwrev_ref[:, :] = jnp.zeros_like(dwrev_ref)
        dwtail_ref[:, :] = jnp.zeros_like(dwtail_ref)
        dg_ref[:, :] = jnp.zeros_like(dg_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)
        # dbias is EXACTLY zero analytically: the laynorm mean makes the
        # conv bias inert (z(y + b) == z(y)), so its Jacobian vanishes;
        # the composed autodiff path only ever produces ~1e-7 fp noise
        # here.  Emitting the exact zero saves an f32 ones-dot per window.
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)

    def body(w, _):
        rolled = _rolled(scratch, w)
        acc = _window_conv(rolled, wrev_ref, wtail_ref, ct, K, mul_dtype)
        O = acc.shape[-1]
        idx = idx_ref[w, :, :].astype(jnp.int32)  # (M, O)
        # pooled pre-norm activation, recomputed through the saved argmax
        g = acc.reshape(M, pool * O)
        y = jnp.zeros((M, O), jnp.float32)
        for i in range(pool):
            y = jnp.where(idx == i, g[:, i * O:(i + 1) * O], y)
        y = y + bias_ref[0:1, :]
        mu = stats_ref[w, 0:1, :]
        s = stats_ref[w, 1:2, :]
        r = 1.0 / (s + eps)
        c = y - mu
        xhat = c * r
        dz = dz_ref[w, :, :].astype(jnp.float32)
        if drop > 0.0:
            # dropout is the LAST fwd op, so its backward applies first;
            # the mask regenerates bit-identically from (seed, window id)
            mask = _drop_mask(seed_ref, n * WB_FUSED_BWD + w, (M, O), drop)
            dz = jnp.where(mask, dz * (1.0 / (1.0 - drop)), 0.0)
        if relu:
            z = xhat * gt_ref[:, :] + bt_ref[:, :]
            dz = jnp.where(z > 0.0, dz, 0.0)
        # dgamma/dbeta accumulate straight into the VMEM refs: a fori
        # carry (one RMW per program) measured NEUTRAL at WB=4 and pushes
        # the WB=8 VMEM stack over its 16 MB limit by ~0.7 MB
        dg_ref[:, :] += dz * xhat
        db_ref[:, :] += dz
        dzg = dz * gt_ref[:, :]
        # A = sum_t dzg, B = sum_t dzg*c as ONE lane-concat dot in the
        # multiply dtype (the f32 3-pass ones-dots were the fused
        # backward's hottest non-MXU cost); moment-grad reductions in
        # bf16 are the same arithmetic class as the bf16 data passes
        O_ = dzg.shape[-1]
        cc = jnp.concatenate([dzg, dzg * c], axis=1)  # (M, 2O)
        AB = jax.lax.dot_general(
            jnp.ones((1, M), mul_dtype), cc.astype(mul_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        A, B = AB[:, :O_], AB[:, O_:]
        # d laynorm: dy = r*dzg - c * (r^2 B)/((M-1) s) - (r/M) A
        # (sum_t c = 0 exactly; s floored so padded zero-variance windows
        # contribute zeros, not NaN)
        fac = (B * r * r) / (max(M - 1, 1) * jnp.maximum(s, 1e-30))
        dy = r * dzg - c * fac - (r / M) * A

        # pool scatter + dW + dX — same passes as _bwd_kernel
        dconv = _pool_scatter(dy, idx, pool)  # (ct, O)
        dconv_m = dconv.astype(mul_dtype)
        p2r = rolled[:, 128:128 + ct].astype(mul_dtype)
        dwrev_ref[:, :] += jax.lax.dot_general(
            p2r, dconv_m, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if K > 128:
            p2b = rolled[120:128, 256:256 + ct].astype(mul_dtype)
            dwtail_ref[:, :] += jax.lax.dot_general(
                p2b, dconv_m, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        mt = jax.lax.dot_general(
            w_ref[:, :].astype(mul_dtype), dconv_m,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (128, ct)
        Wd = dxs_ref.shape[2]
        mt_p = jnp.pad(mt, ((0, 0), (0, Wd - ct)))
        rolledm = pltpu.roll(mt_p, 0, axis=1, stride=1, stride_axis=0)
        dx = jax.lax.dot_general(
            jnp.ones((1, 128), mul_dtype), rolledm.astype(mul_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (1, Wd)
        for k in range(128, K):
            mrow = jax.lax.dot_general(
                wtail_ref[135 - k:136 - k, :].astype(jnp.float32), dconv,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            mrow_p = jnp.pad(mrow, ((0, 0), (0, Wd - ct)))
            dx = dx + pltpu.roll(mrow_p, k, axis=1)
        # 3D stage (window, 8-row sublane pad, Wd): a (WB_FUSED_BWD, Wd)
        # 2D block would violate the 8-sublane block divisibility rule
        dxs_ref[w, 0:1, :] = dx.astype(dxs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, WB_FUSED_BWD, body, 0)


@functools.partial(jax.jit, static_argnames=("pool", "eps", "relu", "drop",
                                             "interpret", "precision"))
def _fused_fwd(x, w, bias, gt, bt, seed, pool, eps, relu, drop, interpret,
               precision):
    N, L = x.shape
    K, O = w.shape
    M = (L - K + 1) // pool
    ct = M * pool
    wrev, wtail = _w_split_rev(w, w.dtype)
    x = _padded_x(x, 1, ct, K)
    Np = ((N + WB - 1) // WB) * WB
    if Np > N:
        x = jnp.pad(x, ((0, Np - N), (0, 0)))
    x3 = x.reshape(Np, 1, x.shape[1])
    bias8 = jnp.zeros((8, O), jnp.float32).at[0, :].set(
        bias.astype(jnp.float32))
    seed2 = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    Wp = 128 + ct + 128

    out, idx, stats = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, K=K, pool=pool, M=M, eps=eps,
                          relu=relu, drop=drop,
                          mul_dtype=_mul_dtype(precision, x.dtype)),
        grid=(Np // WB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda n: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((128, O), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((WB, M, O), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, M, O), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, 8, O), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, M, O), x.dtype),
            jax.ShapeDtypeStruct((Np, M, O), jnp.int8),
            jax.ShapeDtypeStruct((Np, 8, O), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((WB, 1, Wp), x.dtype),
            pltpu.SemaphoreType.DMA((WB,)),
        ],
        interpret=interpret,
    )(x3, seed2, wrev, wtail, bias8, gt, bt)
    return out[:N], idx[:N], stats[:N]


@functools.partial(jax.jit, static_argnames=("K", "pool", "eps", "relu",
                                             "drop", "interpret",
                                             "precision"))
def _fused_bwd(x, dz, idx, stats, seed, w, bias, gt, bt, K, pool, eps, relu,
               drop, interpret, precision):
    # fwd/bwd regenerate the dropout mask from (seed, absolute window id);
    # the id decomposes as n*WB + w in BOTH kernels, which is only the
    # same id when the two grids batch windows identically
    assert WB == WB_FUSED_BWD or drop == 0.0
    N, L = x.shape
    _, M, O = dz.shape
    ct = M * pool
    xp = _padded_x(x, 1, ct, K)
    Np = ((N + WB_FUSED_BWD - 1) // WB_FUSED_BWD) * WB_FUSED_BWD
    if Np > N:
        xp = jnp.pad(xp, ((0, Np - N), (0, 0)))
        dz = jnp.pad(dz, ((0, Np - N), (0, 0), (0, 0)))
        idx = jnp.pad(idx, ((0, Np - N), (0, 0), (0, 0)))
        stats = jnp.pad(stats, ((0, Np - N), (0, 0), (0, 0)))
    xp3 = xp.reshape(Np, 1, xp.shape[1])
    main = min(K, 128)
    w128 = jnp.zeros((128, O), jnp.float32).at[:main, :].set(
        w[:main, :].astype(jnp.float32))
    wrev, wtail = _w_split_rev(w, jnp.float32)
    bias8 = jnp.zeros((8, O), jnp.float32).at[0, :].set(
        bias.astype(jnp.float32))
    seed2 = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    Wp = 128 + ct + 128
    Wd = ct + 128

    dwrev, dwtail, dg, db, dbias8, dxs = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, K=K, pool=pool, M=M, eps=eps,
                          relu=relu, drop=drop,
                          mul_dtype=_mul_dtype(precision, x.dtype)),
        grid=(Np // WB_FUSED_BWD,),
        in_specs=[
            pl.BlockSpec((WB_FUSED_BWD, M, O), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB_FUSED_BWD, M, O), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB_FUSED_BWD, 8, O), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda n: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((128, O), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, O), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((128, O), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, O), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WB_FUSED_BWD, 8, Wd), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((128, O), jnp.float32),
            jax.ShapeDtypeStruct((8, O), jnp.float32),
            jax.ShapeDtypeStruct((M, O), jnp.float32),
            jax.ShapeDtypeStruct((M, O), jnp.float32),
            jax.ShapeDtypeStruct((8, O), jnp.float32),
            jax.ShapeDtypeStruct((Np, 8, Wd), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((WB_FUSED_BWD, 1, Wp), x.dtype),
            pltpu.SemaphoreType.DMA((WB_FUSED_BWD,)),
        ],
        interpret=interpret,
    )(dz, idx, stats, seed2, w128, wrev, wtail, bias8, gt, bt, xp3)
    dxs = dxs[:N, 0, :]

    main = min(K, 128)
    dw = jnp.flip(dwrev[128 - main:, :], axis=0)
    if K > 128:
        dw = jnp.concatenate(
            [dw, dwtail[135 - jnp.arange(128, K), :]], axis=0)
    dx = jnp.zeros((N, xp.shape[1] + 128), jnp.float32)
    dx = dx.at[:, :Wd].add(dxs)
    return (dx[:, :L].astype(x.dtype), dw.astype(x.dtype),
            dbias8[0, :].astype(bias.dtype), dg.astype(gt.dtype),
            db.astype(bt.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def conv1d_pool_ln_act(x, w, bias, gt, bt, seed, pool: int, eps: float,
                       relu: bool, drop: float = 0.0,
                       interpret: bool = False,
                       precision: str = "default"):
    """Fused layer-0 chain: valid C=1 conv (x (N, L), w (K, O)) ->
    max-pool(pool) -> +bias (O,) -> laynorm over pooled time per filter
    (reference unbiased-std + eps-on-std quirk; affine gt/bt are the
    (time, filt)-transposed full maps) -> optional relu -> optional
    inverted dropout (static rate `drop`, on-core PRNG seeded by the
    int32 scalar `seed` + the window id; the backward regenerates the
    identical mask, so no mask residual crosses HBM).  Returns (N, M, O)
    with M = (L-K+1)//pool.  Gradients flow to x, w, bias, gt, bt.
    Geometry must satisfy fused_ln_supported."""
    out, _, _ = _fused_fwd(x, w, bias, gt, bt, seed, pool, eps, relu, drop,
                           interpret, precision)
    return out


def _fused_vjp_fwd(x, w, bias, gt, bt, seed, pool, eps, relu, drop,
                   interpret, precision):
    out, idx, stats = _fused_fwd(x, w, bias, gt, bt, seed, pool, eps, relu,
                                 drop, interpret, precision)
    return out, (x, w, bias, gt, bt, seed, idx, stats)


def _xla_conv_pool_ln_act(x, w, bias, gt, bt, pool, eps, relu, precision):
    """Plain-XLA reference of the whole fused layer-0 chain: conv + pool +
    bias + laynorm over pooled time per (window, filter) with the
    reference's unbiased-std + eps-on-std quirk + optional relu — the
    exact math of _fused_fwd_kernel."""
    y = _xla_conv_pool(x, w, pool, precision) + bias[None, None, :]
    M = y.shape[1]
    mu = jnp.mean(y, axis=1, keepdims=True)
    c = y - mu
    s = jnp.sqrt(jnp.sum(c * c, axis=1, keepdims=True) / max(M - 1, 1))
    z = (c / (s + eps)) * gt[None, :, :] + bt[None, :, :]
    return jnp.maximum(z, 0.0) if relu else z


def _fused_vjp_bwd(pool, eps, relu, drop, interpret, precision, res, dz):
    import numpy as np

    x, w, bias, gt, bt, seed, idx, stats = res
    # seed is an integer primal: its cotangent type is float0
    dseed = np.zeros(np.shape(seed), jax.dtypes.float0)
    if not interpret and _bwd_impl() == "xla":
        # the XLA-composed A/B backward cannot regenerate the on-core
        # PRNG mask; the dispatch layer (models/cnn.py) only fuses
        # dropout on the pallas backward path
        assert drop == 0.0, "xla bwd A/B path does not support fused drop"
        _, vjp = jax.vjp(
            lambda xx, ww, gg, bb: _xla_conv_pool_ln_act(
                xx, ww, bias, gg, bb, pool, eps, relu, precision),
            x, w, gt, bt,
        )
        dx, dw, dg, db = vjp(dz)
        # dbias is EXACTLY zero analytically (the laynorm mean makes the
        # conv bias inert); composing through autodiff would only produce
        # ~1e-7 fp noise for the same quantity
        return dx, dw, jnp.zeros_like(bias), dg, db, dseed
    dx, dw, dbias, dg, db = _fused_bwd(
        x, dz, idx, stats, seed, w, bias, gt, bt, K=w.shape[0], pool=pool,
        eps=eps, relu=relu, drop=drop, interpret=interpret,
        precision=precision)
    return dx, dw, dbias, dg, db, dseed


conv1d_pool_ln_act.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
