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

Backward: custom VJP — the forward saves (ff, u, mask, h_seq) and the
backward is a reverse-time scan that rematerializes the gates from the
saved hidden states (one extra (B,H)x(H,2H) matmul per step) and
accumulates dU on the fly.  A fused pallas backward is a follow-up.
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


def _bwd(interpret, res, g):
    """Reverse-time backward with everything hoistable hoisted:

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
