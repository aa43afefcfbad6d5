"""Pallas fused Li-GRU recurrence kernel.

The hot loop of the flagship model (SURVEY.md §7.4 item 1): after the
feed-forward projections are hoisted (one big MXU matmul + BN done outside),
the recurrence

    r    = h @ U                  # U = [Uh | Uz], (H, 2H)
    z_t  = sigmoid(ffz_t + r_z)
    hc   = relu(ffh_t + r_h) * mask
    h_t  = z_t * h + (1 - z_t) * hc

is strictly sequential in t.  `lax.scan` compiles to a while loop whose
body re-reads h/U through XLA's buffer machinery every step; this kernel
instead runs the whole time loop on-core: U and the dropout mask stay
resident in VMEM, h lives in a VMEM scratch that persists across the
(sequential) grid steps, and the ff gate blocks stream HBM->VMEM via the
pallas pipeline, TIME_BLOCK steps per grid iteration.

Backward: custom VJP with a FUSED reverse-time pallas kernel — the forward
saves (ff, u, mask, h_seq); the backward streams time blocks in reverse
through VMEM with U resident, rematerializes the gates from the saved
hidden states (one (B,H)x(H,2H) MXU matmul per step), carries dh in a VMEM
scratch across grid steps, and accumulates dU/dmask directly into their
(VMEM-resident, constant-index) output blocks.  Training time is dominated
by backward, so this kernel is where the flagship's frames/sec/chip lives.
A lax.scan backward remains as the CPU/parity fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TIME_BLOCK = 16


def _ligru_kernel(ff_ref, u_ref, mask_ref, out_ref, h_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    H = h_ref.shape[-1]

    def body(k, _):
        h = h_ref[:]
        r = jnp.dot(h, u_ref[:], preferred_element_type=jnp.float32)
        ff_k = ff_ref[k]
        zt = jax.nn.sigmoid(ff_k[:, H:] + r[:, H:])
        hc = jnp.maximum(ff_k[:, :H] + r[:, :H], 0.0) * mask_ref[:]
        h_new = zt * h + (1.0 - zt) * hc
        h_ref[:] = h_new
        out_ref[k] = h_new
        return 0

    jax.lax.fori_loop(0, ff_ref.shape[0], body, 0, unroll=True)


def _ligru_pallas_fwd_impl(ff, u, mask, *, interpret=False):
    """ff (T, B, 2H), u (H, 2H), mask (B, H) -> h (T, B, H)."""
    T, B, H2 = ff.shape
    H = H2 // 2
    tb = TIME_BLOCK
    T_pad = ((T + tb - 1) // tb) * tb
    if T_pad != T:
        ff = jnp.pad(ff, ((0, T_pad - T), (0, 0), (0, 0)))
    grid = (T_pad // tb,)
    out = pl.pallas_call(
        _ligru_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, B, 2 * H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 2 * H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, B, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T_pad * B * H * 2 * H + 8 * T_pad * B * H,
            bytes_accessed=4 * (T_pad * B * 3 * H + H * 2 * H + B * H),
            transcendentals=T_pad * B * H,
        ),
    )(ff.astype(jnp.float32), u.astype(jnp.float32), mask.astype(jnp.float32))
    return out[:T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ligru_recurrence(ff, u, mask, interpret=False):
    """Fused Li-GRU recurrence (relu candidate, zero init state)."""
    return _ligru_pallas_fwd_impl(ff, u, mask, interpret=interpret)


def _fwd(ff, u, mask, interpret):
    h = _ligru_pallas_fwd_impl(ff, u, mask, interpret=interpret)
    return h, (ff, u, mask, h)


def _ligru_bwd_kernel(ff_ref, hp_ref, g_ref, u_ref, mask_ref,
                      dff_ref, du_ref, dmask_ref, dh_ref):
    """One REVERSE time block, split into MXU-friendly phases:

    1. gate rematerialization for the WHOLE block as one (tb*B, H) x
       (H, 2H) matmul — it depends only on saved h_prev, not the dh chain;
    2. the truly sequential dh chain: elementwise + one (B, 2H) x (2H, H)
       matmul per step;
    3. dU accumulation as one (H, tb*B) x (tb*B, 2H) contraction over the
       block's dA written in phase 2 (read back from the VMEM-resident
       output block).
    """

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        du_ref[:] = jnp.zeros_like(du_ref)
        dmask_ref[:] = jnp.zeros_like(dmask_ref)

    H = dh_ref.shape[-1]
    tb, B = ff_ref.shape[0], ff_ref.shape[1]
    mask = mask_ref[:]
    u = u_ref[:]

    # phase 1: block-wide gate rematerialization (one big MXU call)
    hp_flat = hp_ref[:].reshape(tb * B, H)
    r = jnp.dot(hp_flat, u, preferred_element_type=jnp.float32)
    r = r.reshape(tb, B, 2 * H)
    a_h = ff_ref[:][..., :H] + r[..., :H]
    zt_all = jax.nn.sigmoid(ff_ref[:][..., H:] + r[..., H:])
    relu_all = jnp.maximum(a_h, 0.0)
    apos_all = (a_h > 0.0).astype(jnp.float32)

    # phase 2: sequential dh chain — a Python loop keeps the time indices
    # static (dynamic_slice on VALUES is not lowerable; tb is small)
    dmask_blk = jnp.zeros((B, H), jnp.float32)
    for k in range(tb - 1, -1, -1):  # walk the block backwards in time
        hp = hp_ref[k]
        zt = zt_all[k]
        relu_ah = relu_all[k]
        hc = relu_ah * mask
        gh = g_ref[k] + dh_ref[:]
        dz = gh * (hp - hc)
        da_z = dz * zt * (1.0 - zt)
        dhc = gh * (1.0 - zt)
        da_h = dhc * mask * apos_all[k]
        da = jnp.concatenate([da_h, da_z], axis=1)  # (B, 2H)
        dff_ref[k] = da
        # dh chain: (B, 2H) x (H, 2H)^T via contraction on the 2H axis
        dh_ref[:] = gh * zt + jax.lax.dot_general(
            da, u, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dmask_blk = dmask_blk + dhc * relu_ah
    dmask_ref[:] += dmask_blk

    # phase 3: dU += hp_block^T dA_block (one MXU call per block)
    du_ref[:] += jax.lax.dot_general(
        hp_flat, dff_ref[:].reshape(tb * B, 2 * H),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _ligru_pallas_bwd_impl(ff, hp, g, u, mask, *, interpret=False):
    """Reverse-streamed fused backward: returns (dff, du, dmask)."""
    T, B, H2 = ff.shape
    H = H2 // 2
    tb = TIME_BLOCK
    T_pad = ((T + tb - 1) // tb) * tb
    if T_pad != T:
        # zero-padded TRAILING steps are processed first (reverse order)
        # with dh=0 and g=0, so every derivative they produce is zero
        pad = ((0, T_pad - T), (0, 0), (0, 0))
        ff, hp, g = jnp.pad(ff, pad), jnp.pad(hp, pad), jnp.pad(g, pad)
    n = T_pad // tb
    grid = (n,)
    rev = lambda i: (n - 1 - i, 0, 0)
    fixed = lambda i: (0, 0)
    dff, du, dmask = pl.pallas_call(
        _ligru_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, B, 2 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 2 * H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, B, 2 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 2 * H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * T_pad * B * H * 2 * H + 16 * T_pad * B * H,
            bytes_accessed=4 * (T_pad * B * 6 * H + 2 * H * 2 * H + 2 * B * H),
            transcendentals=T_pad * B * H,
        ),
    )(
        ff.astype(jnp.float32), hp.astype(jnp.float32),
        g.astype(jnp.float32), u.astype(jnp.float32),
        mask.astype(jnp.float32),
    )
    return dff[:T], du, dmask


def _bwd_fits_vmem(B, H, tb=TIME_BLOCK, budget=15 * 2**20):
    """Scoped-VMEM estimate calibrated against Mosaic's own accounting:
    at (tb=16, B=32, H=550) the compiler reports 17.78 MB on a 16 MB
    limit, of which resident U+dU is 16H^2 bytes (4.84 MB) — the
    remainder scales with tb*B*H at ~46 bytes per unit.  The flagship
    (B=16 after the bidir flip-concat, H=550) sits at ~11.3 MB and keeps
    the fused kernel; larger shapes fall back to the hoisted scan instead
    of hard-failing with a compile-time OOM (measured failure mode)."""
    resident = 16 * H * H
    scaling = 46 * tb * B * H
    return resident + scaling < budget


def _bwd(interpret, res, g):
    """Fused pallas reverse-time backward (hoisted-scan fallback in
    `_bwd_scan` for large shapes and parity tests)."""
    ff, u, mask, h_seq = res
    T, B, H = h_seq.shape
    from tpukaldi.kernels._common import record_dispatch
    from tpukaldi.kernels._common import log_vmem_fallback

    if not interpret and not _bwd_fits_vmem(B, H):
        log_vmem_fallback("ligru", B, H)
        record_dispatch("ligru", "hoisted_scan_bwd", B, H)
        grads = _bwd_scan(interpret, res, g)
        return tuple(
            gr.astype(p.dtype) for gr, p in zip(grads, (ff, u, mask))
        )
    record_dispatch("ligru", "fused_pallas_bwd", B, H)
    h_prev = jnp.concatenate(
        [jnp.zeros((1, B, H), ff.dtype), h_seq[:-1]], axis=0
    )
    grads = _ligru_pallas_bwd_impl(ff, h_prev, g, u, mask,
                                   interpret=interpret)
    # match cotangent dtypes to the primal avals (bf16 compute mode)
    return tuple(gr.astype(p.dtype) for gr, p in zip(grads, (ff, u, mask)))


def _bwd_scan(interpret, res, g):
    """Reverse-time scan backward with everything hoistable hoisted:

    - gate rematerialization (h_prev @ U) runs as ONE (T*B, H) x (H, 2H)
      MXU matmul before the scan;
    - dU = h_prev^T @ dA and the mask gradient run as single post-scan
      contractions instead of per-step outer-product accumulation;
    - the scan body is elementwise + one (B, 2H) x (2H, H) matmul for the
      dh chain — the only truly sequential computation.
    """
    ff, u, mask, h_seq = res
    T, B, H2 = ff.shape
    H = H2 // 2
    h_prev = jnp.concatenate(
        [jnp.zeros((1, B, H), ff.dtype), h_seq[:-1]], axis=0
    )
    r_all = (h_prev.reshape(T * B, H) @ u).reshape(T, B, 2 * H)
    a_h = ff[..., :H] + r_all[..., :H]
    a_z = ff[..., H:] + r_all[..., H:]
    zt = jax.nn.sigmoid(a_z)
    hc = jnp.maximum(a_h, 0.0) * mask
    ut = u.T

    def step(dh_next, inputs):
        g_t, hp, zt_t, hc_t, apos_t = inputs
        gh = g_t + dh_next
        dz = gh * (hp - hc_t)
        da_z = dz * zt_t * (1.0 - zt_t)
        dhc = gh * (1.0 - zt_t)
        da_h = dhc * mask * apos_t
        da = jnp.concatenate([da_h, da_z], axis=1)  # (B, 2H)
        dh_prev = gh * zt_t + da @ ut
        return dh_prev, (da, dhc)

    apos = (a_h > 0.0).astype(ff.dtype)
    _, (dff, dhc_seq) = jax.lax.scan(
        step,
        jnp.zeros((B, H), ff.dtype),
        (g, h_prev, zt, hc, apos),
        reverse=True,
    )
    # post-scan contractions (MXU-shaped)
    du = h_prev.reshape(T * B, H).T @ dff.reshape(T * B, 2 * H)
    dmask = jnp.sum(dhc_seq * jnp.maximum(a_h, 0.0), axis=0)
    return dff, du, dmask


ligru_recurrence.defvjp(_fwd, _bwd)


def ligru_recurrence_scan(ff, u, mask):
    """Pure lax.scan reference of the same recurrence (for parity tests and
    as the CPU fallback)."""
    H = ff.shape[-1] // 2

    def step(h, ff_t):
        r = h @ u
        zt = jax.nn.sigmoid(ff_t[:, H:] + r[:, H:])
        hc = jnp.maximum(ff_t[:, :H] + r[:, :H], 0.0) * mask
        h = zt * h + (1 - zt) * hc
        return h, h

    _, h = jax.lax.scan(step, jnp.zeros((ff.shape[1], H), ff.dtype), ff)
    return h
