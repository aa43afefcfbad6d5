"""Pallas fused LSTM recurrence kernel (tanh candidate/output, the zoo's
default) — same design as kernels/ligru.py: U and the dropout mask resident
in VMEM, (h, c) carried in VMEM scratch across sequential grid steps, ff
gate blocks streamed on the pallas pipeline.

Cell semantics are the reference's custom LSTM (neural_networks.py:457-469):

    r  = h @ U                      # U = [Uf | Ui | Uo | Uc], (H, 4H)
    f  = sigmoid(ff_f + r_f)
    i  = sigmoid(ff_i + r_i)
    o  = sigmoid(ff_o + r_o)
    c  = i * tanh(ff_c + r_c) * mask + f * c
    h  = o * tanh(c)

Backward (custom VJP): a FUSED reverse-streamed pallas kernel in the
kernels/ligru.py::_ligru_bwd_kernel mold — gates rematerialized block-wide
from the saved (h, c) sequences with one (tb*B, H) x (H, 4H) MXU matmul,
the truly sequential (dh, dc) chain carried in VMEM scratch, dU/dmask
accumulated into fixed-index output blocks.  With 4 gates the resident
U + dU alone cost 8H^2 floats (~9.7 MB at H=550), so the backward streams
smaller time blocks (TIME_BLOCK_BWD=4) than the forward to stay inside
the ~16 MB VMEM budget; `_bwd_fits_vmem` falls back to the hoisted-scan
backward (`_bwd_scan`, also the parity reference) for larger H.
Measured at the recipe shape (T=500, B=16, H=550): scan backward
+1.71 ms/layer vs fused +~0.4 ms — training is backward-dominated, so
this is where LSTM recipes' frames/sec lives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukaldi.kernels._common import log_vmem_fallback as _log_vmem_fallback

TIME_BLOCK = 16


def _lstm_kernel(ff_ref, u_ref, mask_ref, h_out_ref, c_out_ref, h_ref, c_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    H = h_ref.shape[-1]

    def body(k, _):
        h = h_ref[:]
        c = c_ref[:]
        r = jnp.dot(h, u_ref[:], preferred_element_type=jnp.float32)
        ff_k = ff_ref[k]
        f = jax.nn.sigmoid(ff_k[:, :H] + r[:, :H])
        i = jax.nn.sigmoid(ff_k[:, H : 2 * H] + r[:, H : 2 * H])
        o = jax.nn.sigmoid(ff_k[:, 2 * H : 3 * H] + r[:, 2 * H : 3 * H])
        cand = jnp.tanh(ff_k[:, 3 * H :] + r[:, 3 * H :])
        c_new = i * cand * mask_ref[:] + f * c
        h_new = o * jnp.tanh(c_new)
        h_ref[:] = h_new
        c_ref[:] = c_new
        h_out_ref[k] = h_new
        c_out_ref[k] = c_new
        return 0

    jax.lax.fori_loop(0, ff_ref.shape[0], body, 0, unroll=True)


def _lstm_pallas_fwd_impl(ff, u, mask, *, interpret=False):
    """ff (T, B, 4H), u (H, 4H), mask (B, H) -> (h, c) each (T, B, H)."""
    T, B, H4 = ff.shape
    H = H4 // 4
    tb = TIME_BLOCK
    T_pad = ((T + tb - 1) // tb) * tb
    if T_pad != T:
        ff = jnp.pad(ff, ((0, T_pad - T), (0, 0), (0, 0)))
    h, c = pl.pallas_call(
        _lstm_kernel,
        grid=(T_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, B, 4 * H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, B, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T_pad * B * H * 4 * H + 16 * T_pad * B * H,
            bytes_accessed=4 * (T_pad * B * 6 * H + H * 4 * H + B * H),
            transcendentals=4 * T_pad * B * H,
        ),
    )(ff.astype(jnp.float32), u.astype(jnp.float32), mask.astype(jnp.float32))
    return h[:T], c[:T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_recurrence(ff, u, mask, interpret=False):
    """Fused LSTM recurrence; returns the hidden sequence (T, B, H)."""
    h, _ = _lstm_pallas_fwd_impl(ff, u, mask, interpret=interpret)
    return h


def _fwd(ff, u, mask, interpret):
    h, c = _lstm_pallas_fwd_impl(ff, u, mask, interpret=interpret)
    return h, (ff, u, mask, h, c)


TIME_BLOCK_BWD = 4


def _lstm_bwd_kernel(ff_ref, hp_ref, cp_ref, c_ref, g_ref, u_ref, mask_ref,
                     dff_ref, du_ref, dmask_ref, dh_ref, dc_ref):
    """One REVERSE time block (same 3-phase structure as the liGRU
    backward): block-wide gate rematerialization, the sequential (dh, dc)
    chain, then the dU block contraction."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        du_ref[:] = jnp.zeros_like(du_ref)
        dmask_ref[:] = jnp.zeros_like(dmask_ref)

    H = dh_ref.shape[-1]
    tb, B = ff_ref.shape[0], ff_ref.shape[1]
    mask = mask_ref[:]
    u = u_ref[:]

    # phase 1: block-wide gate rematerialization (one big MXU call)
    hp_flat = hp_ref[:].reshape(tb * B, H)
    a = ff_ref[:] + jnp.dot(
        hp_flat, u, preferred_element_type=jnp.float32
    ).reshape(tb, B, 4 * H)
    f_all = jax.nn.sigmoid(a[..., :H])
    i_all = jax.nn.sigmoid(a[..., H : 2 * H])
    o_all = jax.nn.sigmoid(a[..., 2 * H : 3 * H])
    cand_all = jnp.tanh(a[..., 3 * H :])
    tanh_c_all = jnp.tanh(c_ref[:])

    # phase 2: sequential (dh, dc) chain, walked backwards in time
    dmask_blk = jnp.zeros((B, H), jnp.float32)
    for k in range(tb - 1, -1, -1):
        f, i, o = f_all[k], i_all[k], o_all[k]
        cand, tanh_c = cand_all[k], tanh_c_all[k]
        gh = g_ref[k] + dh_ref[:]
        do = gh * tanh_c
        da_o = do * o * (1.0 - o)
        dc = gh * o * (1.0 - tanh_c**2) + dc_ref[:]
        df = dc * cp_ref[k]
        da_f = df * f * (1.0 - f)
        di = dc * cand * mask
        da_i = di * i * (1.0 - i)
        dcand = dc * i * mask
        da_c = dcand * (1.0 - cand**2)
        da = jnp.concatenate([da_f, da_i, da_o, da_c], axis=1)  # (B, 4H)
        dff_ref[k] = da
        # dh chain: (B, 4H) x (H, 4H)^T via contraction on the 4H axis
        dh_ref[:] = jax.lax.dot_general(
            da, u, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dc_ref[:] = dc * f
        dmask_blk = dmask_blk + dc * i * cand
    dmask_ref[:] += dmask_blk

    # phase 3: dU += hp_block^T dA_block (one MXU call per block)
    du_ref[:] += jax.lax.dot_general(
        hp_flat, dff_ref[:].reshape(tb * B, 4 * H),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_fits_vmem(B, H, tb=TIME_BLOCK_BWD, budget=14 * 2**20):
    """Resident U + dU (8H^2 floats) + double-buffered streamed blocks
    (ff/hp/cp/c/g in, dff out) + the phase-1 temporaries."""
    resident = 2 * H * 4 * H * 4
    streams = 2 * tb * B * (4 * H + 3 * H + H + 4 * H) * 4
    temps = tb * B * (4 * H + 5 * H) * 4
    return resident + streams + temps < budget


def _lstm_pallas_bwd_impl(ff, hp, cp, c, g, u, mask, *, interpret=False):
    """Reverse-streamed fused backward: returns (dff, du, dmask)."""
    T, B, H4 = ff.shape
    H = H4 // 4
    tb = TIME_BLOCK_BWD
    T_pad = ((T + tb - 1) // tb) * tb
    if T_pad != T:
        # zero-padded TRAILING steps run first (reverse order) with
        # dh=dc=0 and g=0, producing all-zero derivatives
        pad = ((0, T_pad - T), (0, 0), (0, 0))
        ff, hp, cp = jnp.pad(ff, pad), jnp.pad(hp, pad), jnp.pad(cp, pad)
        c, g = jnp.pad(c, pad), jnp.pad(g, pad)
    n = T_pad // tb
    rev = lambda i: (n - 1 - i, 0, 0)
    fixed = lambda i: (0, 0)
    dff, du, dmask = pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((tb, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * T_pad * B * H * 4 * H + 30 * T_pad * B * H,
            bytes_accessed=4 * (T_pad * B * 12 * H + 2 * H * 4 * H + 2 * B * H),
            transcendentals=5 * T_pad * B * H,
        ),
    )(
        ff.astype(jnp.float32), hp.astype(jnp.float32),
        cp.astype(jnp.float32), c.astype(jnp.float32),
        g.astype(jnp.float32), u.astype(jnp.float32),
        mask.astype(jnp.float32),
    )
    return dff[:T], du, dmask


def _bwd(interpret, res, g):
    """Fused pallas reverse-time backward; `_bwd_scan` is the hoisted-scan
    fallback (large H) and the gradient-parity reference."""
    ff, u, mask, h_seq, c_seq = res
    T, B, H4 = ff.shape
    H = H4 // 4
    from tpukaldi.kernels._common import record_dispatch

    if not _bwd_fits_vmem(B, H):
        _log_vmem_fallback("lstm", B, H)
        record_dispatch("lstm", "hoisted_scan_bwd", B, H)
        grads = _bwd_scan(interpret, res, g)
    else:
        record_dispatch("lstm", "fused_pallas_bwd", B, H)
        zeros = jnp.zeros((1, B, H), ff.dtype)
        h_prev = jnp.concatenate([zeros, h_seq[:-1]], axis=0)
        c_prev = jnp.concatenate([zeros, c_seq[:-1]], axis=0)
        grads = _lstm_pallas_bwd_impl(ff, h_prev, c_prev, c_seq, g, u, mask,
                                      interpret=interpret)
    # cotangent dtypes must match the primal avals (bf16 compute mode feeds
    # bf16 ff/u/mask): the pinned JAX tolerates f32-vs-bf16 custom_vjp
    # outputs, future releases may not
    return tuple(gr.astype(p.dtype) for gr, p in zip(grads, (ff, u, mask)))


def _bwd_scan(interpret, res, g):
    ff, u, mask, h_seq, c_seq = res
    T, B, H4 = ff.shape
    H = H4 // 4
    zeros = jnp.zeros((1, B, H), ff.dtype)
    h_prev = jnp.concatenate([zeros, h_seq[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros, c_seq[:-1]], axis=0)
    # hoisted gate rematerialization
    r_all = (h_prev.reshape(T * B, H) @ u).reshape(T, B, 4 * H)
    a = ff + r_all
    f = jax.nn.sigmoid(a[..., :H])
    i = jax.nn.sigmoid(a[..., H : 2 * H])
    o = jax.nn.sigmoid(a[..., 2 * H : 3 * H])
    cand = jnp.tanh(a[..., 3 * H :])
    tanh_c = jnp.tanh(c_seq)
    ut = u.T

    def step(carry, inputs):
        dh_next, dc_next = carry
        g_t, f_t, i_t, o_t, cand_t, tanh_c_t, cp = inputs
        gh = g_t + dh_next
        do = gh * tanh_c_t
        da_o = do * o_t * (1.0 - o_t)
        dc = gh * o_t * (1.0 - tanh_c_t**2) + dc_next
        df = dc * cp
        da_f = df * f_t * (1.0 - f_t)
        di = dc * cand_t * mask
        da_i = di * i_t * (1.0 - i_t)
        dcand = dc * i_t * mask
        da_c = dcand * (1.0 - cand_t**2)
        dmask_t = dc * i_t * cand_t
        da = jnp.concatenate([da_f, da_i, da_o, da_c], axis=1)  # (B, 4H)
        dh_prev = da @ ut
        dc_prev = dc * f_t
        return (dh_prev, dc_prev), (da, dmask_t)

    z = jnp.zeros((B, H), ff.dtype)
    _, (dff, dmask_seq) = jax.lax.scan(
        step, (z, z), (g, f, i, o, cand, tanh_c, c_prev), reverse=True
    )
    du = h_prev.reshape(T * B, H).T @ dff.reshape(T * B, 4 * H)
    dmask = jnp.sum(dmask_seq, axis=0)
    return dff, du, dmask


lstm_recurrence.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Lean resident-U variant — large-H cells (QLSTM H=1024, LSTM beyond the
# f32 budget).
# ---------------------------------------------------------------------------
# The f32 kernels above go through `_bwd_fits_vmem`, which keeps U + dU
# (8H^2 f32 = 32 MB at H=1024) resident — past the ~16 MB VMEM core budget,
# so those shapes fell back to the hoisted scan.  The scan re-reads U from
# HBM on EVERY recurrence step: at the QLSTM recipe (T=500, 2 layers, bidir
# B=32, H=1024) that is 16 MB x 2000 sequential iterations = 32 GB of HBM
# traffic per training step, and the measured f32 scan (43.5 ms) sits
# exactly at the v5e ~819 GB/s bandwidth floor — the weights, not the
# math, are the step.
#
# The lean variant removes both residents:
#  - U is held in VMEM in BF16 (4H^2 bytes = 8 MB at H=1024).  This is not
#    a precision downgrade: XLA's DEFAULT matmul precision on TPU already
#    multiplies f32 operands as bf16 with f32 accumulation, so the scan
#    path this replaces performs the same bf16 products.  h stays f32 in
#    scratch and is rounded to bf16 only as the matmul operand, exactly as
#    the MXU would under DEFAULT.
#  - dU never enters the kernel: the backward streams out dA (= dff) and
#    dU = h_prev^T @ dA runs as ONE (T*B, H) x (T*B, 4H) XLA contraction
#    afterwards — identical to the hoisted-scan fallback's own dU, and
#    batched over T*B so it is MXU-bound, not latency-bound.
#
# With U resident, each recurrence iteration is a VMEM-fed
# (B, H) x (H, 4H) bf16 MXU matmul plus VPU gate math — the same
# latency-bound regime as the flagship liGRU kernel, ~an order of
# magnitude under the HBM-floored scan at H=1024.


def _lean_budget_fwd(B, H, tb):
    """Bytes the lean forward needs: bf16 U + mask resident, double-
    buffered ff in / (h, c) out blocks, f32 (h, c) scratch + body temps."""
    resident = 2 * H * 4 * H + 4 * B * H
    streams = 2 * tb * B * (4 * H + 2 * H) * 4
    temps = 2 * B * H * 4 + B * 4 * H * 4
    return resident + streams + temps


def _lean_budget_bwd(B, H, tb):
    """Backward: bf16 U + dmask resident, streamed ff/hp/cp/c/g in and
    dff out, (dh, dc) scratch, phase-1 gate temps."""
    resident = 2 * H * 4 * H + 4 * B * H
    streams = 2 * tb * B * (4 * H + 4 * H + 4 * H) * 4
    temps = 2 * B * H * 4 + tb * B * 9 * H * 4
    return resident + streams + temps


def _lean_pick_tb(budget_fn, B, H, cap=14 * 2**20):
    for tb in (16, 8, 4, 2, 1):
        if budget_fn(B, H, tb) < cap:
            return tb
    return 0  # nothing fits: caller falls back to the hoisted scan


def lean_fits_vmem(B, H):
    return (_lean_pick_tb(_lean_budget_fwd, B, H) > 0
            and _lean_pick_tb(_lean_budget_bwd, B, H) > 0)


def _lstm_lean_kernel(ff_ref, u_ref, mask_ref, h_out_ref, c_out_ref,
                      h_ref, c_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    H = h_ref.shape[-1]

    def body(k, _):
        h = h_ref[:]
        c = c_ref[:]
        # bf16 x bf16 -> f32: DEFAULT-precision products, U read from VMEM
        r = jnp.dot(h.astype(u_ref.dtype), u_ref[:],
                    preferred_element_type=jnp.float32)
        ff_k = ff_ref[k].astype(jnp.float32)
        f = jax.nn.sigmoid(ff_k[:, :H] + r[:, :H])
        i = jax.nn.sigmoid(ff_k[:, H : 2 * H] + r[:, H : 2 * H])
        o = jax.nn.sigmoid(ff_k[:, 2 * H : 3 * H] + r[:, 2 * H : 3 * H])
        cand = jnp.tanh(ff_k[:, 3 * H :] + r[:, 3 * H :])
        c_new = i * cand * mask_ref[:] + f * c
        h_new = o * jnp.tanh(c_new)
        h_ref[:] = h_new
        c_ref[:] = c_new
        h_out_ref[k] = h_new
        c_out_ref[k] = c_new
        return 0

    jax.lax.fori_loop(0, ff_ref.shape[0], body, 0, unroll=True)


def _lstm_lean_fwd_impl(ff, u, mask, *, interpret=False):
    """ff (T, B, 4H) in its native dtype, u (H, 4H) -> bf16 resident."""
    T, B, H4 = ff.shape
    H = H4 // 4
    tb = _lean_pick_tb(_lean_budget_fwd, B, H)
    T_pad = ((T + tb - 1) // tb) * tb
    if T_pad != T:
        ff = jnp.pad(ff, ((0, T_pad - T), (0, 0), (0, 0)))
    h, c = pl.pallas_call(
        _lstm_lean_kernel,
        grid=(T_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, B, 4 * H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, B, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T_pad * B * H * 4 * H + 16 * T_pad * B * H,
            bytes_accessed=(T_pad * B * 4 * H * ff.dtype.itemsize
                            + 4 * T_pad * B * 2 * H + 2 * H * 4 * H
                            + 4 * B * H),
            transcendentals=4 * T_pad * B * H,
        ),
    )(ff, u.astype(jnp.bfloat16), mask.astype(jnp.float32))
    return h[:T], c[:T]


def _lstm_lean_bwd_kernel(ff_ref, hp_ref, cp_ref, c_ref, g_ref, u_ref,
                          mask_ref, dff_ref, dmask_ref, dh_ref, dc_ref):
    """Reverse time block: bf16-U gate rematerialization, the sequential
    (dh, dc) chain, NO dU phase (contracted outside the kernel)."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dmask_ref[:] = jnp.zeros_like(dmask_ref)

    H = dh_ref.shape[-1]
    tb, B = ff_ref.shape[0], ff_ref.shape[1]
    mask = mask_ref[:]
    u = u_ref[:]

    # phase 1: block-wide gate remat — SAME bf16 products as the forward,
    # so the rematerialized gates match the forward's bit-for-bit
    hp_flat = hp_ref[:].reshape(tb * B, H)
    a = ff_ref[:].astype(jnp.float32) + jnp.dot(
        hp_flat.astype(u.dtype), u, preferred_element_type=jnp.float32
    ).reshape(tb, B, 4 * H)
    f_all = jax.nn.sigmoid(a[..., :H])
    i_all = jax.nn.sigmoid(a[..., H : 2 * H])
    o_all = jax.nn.sigmoid(a[..., 2 * H : 3 * H])
    cand_all = jnp.tanh(a[..., 3 * H :])
    tanh_c_all = jnp.tanh(c_ref[:])

    # phase 2: sequential (dh, dc) chain, walked backwards in time
    dmask_blk = jnp.zeros((B, H), jnp.float32)
    for k in range(tb - 1, -1, -1):
        f, i, o = f_all[k], i_all[k], o_all[k]
        cand, tanh_c = cand_all[k], tanh_c_all[k]
        gh = g_ref[k] + dh_ref[:]
        do = gh * tanh_c
        da_o = do * o * (1.0 - o)
        dc = gh * o * (1.0 - tanh_c**2) + dc_ref[:]
        df = dc * cp_ref[k]
        da_f = df * f * (1.0 - f)
        di = dc * cand * mask
        da_i = di * i * (1.0 - i)
        dcand = dc * i * mask
        da_c = dcand * (1.0 - cand**2)
        da = jnp.concatenate([da_f, da_i, da_o, da_c], axis=1)  # (B, 4H)
        dff_ref[k] = da.astype(dff_ref.dtype)
        dh_ref[:] = jax.lax.dot_general(
            da.astype(u.dtype), u, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dc_ref[:] = dc * f
        dmask_blk = dmask_blk + dc * i * cand
    dmask_ref[:] += dmask_blk


def _lstm_lean_bwd_impl(ff, hp, cp, c, g, u, mask, *, interpret=False):
    """Returns (dff, dmask); dU is contracted by the caller."""
    T, B, H4 = ff.shape
    H = H4 // 4
    tb = _lean_pick_tb(_lean_budget_bwd, B, H)
    T_pad = ((T + tb - 1) // tb) * tb
    if T_pad != T:
        pad = ((0, T_pad - T), (0, 0), (0, 0))
        ff, hp, cp = jnp.pad(ff, pad), jnp.pad(hp, pad), jnp.pad(cp, pad)
        c, g = jnp.pad(c, pad), jnp.pad(g, pad)
    n = T_pad // tb
    rev = lambda i: (n - 1 - i, 0, 0)
    fixed = lambda i: (0, 0)
    dff, dmask = pl.pallas_call(
        _lstm_lean_bwd_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((tb, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B, 4 * H), ff.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * T_pad * B * H * 4 * H + 30 * T_pad * B * H,
            bytes_accessed=(T_pad * B * 4 * H * 2 * ff.dtype.itemsize
                            + 4 * T_pad * B * 8 * H + 2 * H * 4 * H),
            transcendentals=5 * T_pad * B * H,
        ),
    )(
        ff, hp.astype(jnp.float32), cp.astype(jnp.float32),
        c.astype(jnp.float32), g.astype(jnp.float32),
        u.astype(jnp.bfloat16), mask.astype(jnp.float32),
    )
    return dff[:T], dmask


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_recurrence_lean(ff, u, mask, interpret=False):
    """Resident-bf16-U fused LSTM recurrence for large H (e.g. the QLSTM
    recipe's Hamilton-dense H=1024).  Same cell semantics as
    `lstm_recurrence`; numerically in-family with the lax.scan path, whose
    DEFAULT-precision matmuls already multiply in bf16."""
    h, _ = _lstm_lean_fwd_impl(ff, u, mask, interpret=interpret)
    return h


def _lean_fwd(ff, u, mask, interpret):
    h, c = _lstm_lean_fwd_impl(ff, u, mask, interpret=interpret)
    return h, (ff, u, mask, h, c)


def _lean_bwd(interpret, res, g):
    ff, u, mask, h_seq, c_seq = res
    T, B, H4 = ff.shape
    H = H4 // 4
    from tpukaldi.kernels._common import record_dispatch

    record_dispatch("lstm_lean", "fused_pallas_leanu_bwd", B, H)
    zeros = jnp.zeros((1, B, H), jnp.float32)
    h_prev = jnp.concatenate([zeros, h_seq[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros, c_seq[:-1]], axis=0)
    dff, dmask = _lstm_lean_bwd_impl(ff, h_prev, c_prev, c_seq, g, u, mask,
                                     interpret=interpret)
    # dU as ONE batched MXU contraction over T*B — the same arithmetic the
    # hoisted-scan fallback performs, off the sequential critical path
    du = h_prev.reshape(T * B, H).T @ dff.reshape(T * B, 4 * H).astype(
        jnp.float32)
    return (dff.astype(ff.dtype), du.astype(u.dtype),
            dmask.astype(mask.dtype))


lstm_recurrence_lean.defvjp(_lean_fwd, _lean_bwd)


def lstm_recurrence_scan(ff, u, mask):
    """Pure lax.scan reference of the same recurrence."""
    H = ff.shape[-1] // 4

    def step(state, ff_t):
        h, c = state
        r = h @ u
        f = jax.nn.sigmoid(ff_t[:, :H] + r[:, :H])
        i = jax.nn.sigmoid(ff_t[:, H : 2 * H] + r[:, H : 2 * H])
        o = jax.nn.sigmoid(ff_t[:, 2 * H : 3 * H] + r[:, 2 * H : 3 * H])
        cand = jnp.tanh(ff_t[:, 3 * H :] + r[:, 3 * H :])
        c = i * cand * mask + f * c
        h = o * jnp.tanh(c)
        return (h, c), h

    z = jnp.zeros((ff.shape[1], H), ff.dtype)
    _, h = jax.lax.scan(step, (z, z), ff)
    return h
