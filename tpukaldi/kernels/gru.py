"""Pallas fused GRU recurrence kernel.

The standard GRU (reference neural_networks.py:629-641) has a data
dependence the Li-GRU doesn't: the candidate matmul acts on rt*h, so each
step needs TWO sequential recurrent matmuls

    [uz|ur] = h @ Uzr                  # (B, H) x (H, 2H)
    z = sigmoid(ff_z + uz);  r = sigmoid(ff_r + ur)
    a = ff_h + (r * h) @ Uh            # (B, H) x (H, H)
    h = z * h + (1 - z) * act(a) * mask

Kernel design matches kernels/ligru.py (weights/mask in VMEM, h in VMEM
scratch across sequential grid steps, ff streamed).  `act` is a static
choice (relu | tanh), matching the zoo's act factory.

Backward (custom VJP): a FUSED reverse-streamed pallas kernel (the
kernels/ligru.py design): gates rematerialized block-wide with two MXU
matmuls (h_prev @ Uzr and (r*h_prev) @ Uh), the sequential dh chain in
VMEM scratch with two small per-step matmuls, dUzr/dUh/dmask accumulated
into fixed-index output blocks.  Resident Uzr/Uh + grads cost 6H^2 floats
(~7.3 MB at H=550), so the backward streams TIME_BLOCK_BWD=8 blocks;
`_bwd_fits_vmem` falls back to the hoisted-scan backward (`_bwd_scan`,
also the parity reference) for larger H.  Measured at the recipe shape:
scan backward +1.54 ms/layer vs the liGRU-style fused ~+0.4 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukaldi.kernels._common import log_vmem_fallback as _log_vmem_fallback

TIME_BLOCK = 16


def _act(name, x):
    return jnp.maximum(x, 0.0) if name == "relu" else jnp.tanh(x)


def _dact(name, a):
    return (a > 0.0).astype(a.dtype) if name == "relu" else 1.0 - jnp.tanh(a) ** 2


def _gru_kernel(act_name, ff_ref, uzr_ref, uh_ref, mask_ref, out_ref, h_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    H = h_ref.shape[-1]

    def body(k, _):
        h = h_ref[:]
        rzr = jnp.dot(h, uzr_ref[:], preferred_element_type=jnp.float32)
        ff_k = ff_ref[k]
        z = jax.nn.sigmoid(ff_k[:, H : 2 * H] + rzr[:, :H])
        r = jax.nn.sigmoid(ff_k[:, 2 * H :] + rzr[:, H:])
        a = ff_k[:, :H] + jnp.dot(
            r * h, uh_ref[:], preferred_element_type=jnp.float32
        )
        hc = _act(act_name, a) * mask_ref[:]
        h_new = z * h + (1.0 - z) * hc
        h_ref[:] = h_new
        out_ref[k] = h_new
        return 0

    jax.lax.fori_loop(0, ff_ref.shape[0], body, 0, unroll=True)


def _gru_pallas_fwd_impl(ff, uzr, uh, mask, act_name, *, interpret=False):
    """ff (T, B, 3H) as [h|z|r], uzr (H, 2H), uh (H, H) -> h (T, B, H)."""
    T, B, H3 = ff.shape
    H = H3 // 3
    tb = TIME_BLOCK
    T_pad = ((T + tb - 1) // tb) * tb
    if T_pad != T:
        ff = jnp.pad(ff, ((0, T_pad - T), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_gru_kernel, act_name),
        grid=(T_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, B, 3 * H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 2 * H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, B, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(
        ff.astype(jnp.float32), uzr.astype(jnp.float32),
        uh.astype(jnp.float32), mask.astype(jnp.float32),
    )
    return out[:T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gru_recurrence(ff, uzr, uh, mask, act_name="relu", interpret=False):
    return _gru_pallas_fwd_impl(ff, uzr, uh, mask, act_name,
                                interpret=interpret)


def _fwd(ff, uzr, uh, mask, act_name, interpret):
    h = _gru_pallas_fwd_impl(ff, uzr, uh, mask, act_name, interpret=interpret)
    return h, (ff, uzr, uh, mask, h)


TIME_BLOCK_BWD = 8


def _gru_bwd_kernel(act_name, ff_ref, hp_ref, g_ref, uzr_ref, uh_ref,
                    mask_ref, dff_ref, duzr_ref, duh_ref, dmask_ref, dh_ref):
    """One REVERSE time block: block-wide gate rematerialization (two MXU
    matmuls), the sequential dh chain, then the dUzr/dUh contractions."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        duzr_ref[:] = jnp.zeros_like(duzr_ref)
        duh_ref[:] = jnp.zeros_like(duh_ref)
        dmask_ref[:] = jnp.zeros_like(dmask_ref)

    H = dh_ref.shape[-1]
    tb, B = ff_ref.shape[0], ff_ref.shape[1]
    mask = mask_ref[:]
    uzr = uzr_ref[:]
    uh = uh_ref[:]

    # phase 1: block-wide gate rematerialization
    hp_flat = hp_ref[:].reshape(tb * B, H)
    rzr = jnp.dot(hp_flat, uzr, preferred_element_type=jnp.float32)
    rzr = rzr.reshape(tb, B, 2 * H)
    z_all = jax.nn.sigmoid(ff_ref[:][..., H : 2 * H] + rzr[..., :H])
    r_all = jax.nn.sigmoid(ff_ref[:][..., 2 * H :] + rzr[..., H:])
    rh_all = r_all * hp_ref[:]
    a_all = ff_ref[:][..., :H] + jnp.dot(
        rh_all.reshape(tb * B, H), uh, preferred_element_type=jnp.float32
    ).reshape(tb, B, H)
    hc_all = _act(act_name, a_all) * mask

    # phase 2: sequential dh chain, walked backwards in time
    dmask_blk = jnp.zeros((B, H), jnp.float32)
    for k in range(tb - 1, -1, -1):
        hp, z, r = hp_ref[k], z_all[k], r_all[k]
        gh = g_ref[k] + dh_ref[:]
        dz = gh * (hp - hc_all[k])
        da_z = dz * z * (1.0 - z)
        dhc = gh * (1.0 - z)
        da = dhc * mask * _dact(act_name, a_all[k])
        # drh: (B, H) x (H, H)^T via contraction on the second H axis
        drh = jax.lax.dot_general(
            da, uh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dr = drh * hp
        da_r = dr * r * (1.0 - r)
        dzr = jnp.concatenate([da_z, da_r], axis=1)  # (B, 2H)
        dff_ref[k] = jnp.concatenate([da, dzr], axis=1)  # ff order h|z|r
        dh_ref[:] = gh * z + drh * r + jax.lax.dot_general(
            dzr, uzr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dmask_blk = dmask_blk + dhc * _act(act_name, a_all[k])
    dmask_ref[:] += dmask_blk

    # phase 3: weight-grad contractions (one MXU call each per block)
    dff_blk = dff_ref[:]
    duzr_ref[:] += jax.lax.dot_general(
        hp_flat, dff_blk[..., H:].reshape(tb * B, 2 * H),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    duh_ref[:] += jax.lax.dot_general(
        rh_all.reshape(tb * B, H), dff_blk[..., :H].reshape(tb * B, H),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_fits_vmem(B, H, tb=TIME_BLOCK_BWD, budget=14 * 2**20):
    """Resident Uzr/Uh + grads (6H^2 floats) + double-buffered streamed
    blocks (ff/hp/g in, dff out) + phase-1 temporaries."""
    resident = 6 * H * H * 4
    streams = 2 * tb * B * (3 * H + 2 * H + 3 * H) * 4
    temps = tb * B * (2 * H + 5 * H) * 4
    return resident + streams + temps < budget


def _gru_pallas_bwd_impl(ff, hp, g, uzr, uh, mask, act_name, *,
                         interpret=False):
    """Reverse-streamed fused backward: returns (dff, duzr, duh, dmask)."""
    T, B, H3 = ff.shape
    H = H3 // 3
    tb = TIME_BLOCK_BWD
    T_pad = ((T + tb - 1) // tb) * tb
    if T_pad != T:
        # zero-padded TRAILING steps run first (reverse order) with dh=0
        # and g=0, producing all-zero derivatives
        pad = ((0, T_pad - T), (0, 0), (0, 0))
        ff, hp, g = jnp.pad(ff, pad), jnp.pad(hp, pad), jnp.pad(g, pad)
    n = T_pad // tb
    rev = lambda i: (n - 1 - i, 0, 0)
    fixed = lambda i: (0, 0)
    dff, duzr, duh, dmask = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, act_name),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((tb, B, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 2 * H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, B, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 2 * H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * T_pad * B * H * 3 * H + 24 * T_pad * B * H,
            bytes_accessed=4 * (T_pad * B * 8 * H + 6 * H * H + 2 * B * H),
            transcendentals=3 * T_pad * B * H,
        ),
    )(
        ff.astype(jnp.float32), hp.astype(jnp.float32),
        g.astype(jnp.float32), uzr.astype(jnp.float32),
        uh.astype(jnp.float32), mask.astype(jnp.float32),
    )
    return dff[:T], duzr, duh, dmask


def _bwd(act_name, interpret, res, g):
    """Fused pallas reverse-time backward; `_bwd_scan` is the hoisted-scan
    fallback (large H) and the gradient-parity reference."""
    ff, uzr, uh, mask, h_seq = res
    T, B, H3 = ff.shape
    H = H3 // 3
    from tpukaldi.kernels._common import record_dispatch

    if not _bwd_fits_vmem(B, H):
        _log_vmem_fallback("gru", B, H)
        record_dispatch("gru", "hoisted_scan_bwd", B, H)
        grads = _bwd_scan(act_name, interpret, res, g)
    else:
        record_dispatch("gru", "fused_pallas_bwd", B, H)
        h_prev = jnp.concatenate(
            [jnp.zeros((1, B, H), ff.dtype), h_seq[:-1]], axis=0
        )
        grads = _gru_pallas_bwd_impl(ff, h_prev, g, uzr, uh, mask, act_name,
                                     interpret=interpret)
    # match cotangent dtypes to the primal avals (bf16 compute mode)
    return tuple(
        gr.astype(p.dtype) for gr, p in zip(grads, (ff, uzr, uh, mask))
    )


def _bwd_scan(act_name, interpret, res, g):
    ff, uzr, uh, mask, h_seq = res
    T, B, H3 = ff.shape
    H = H3 // 3
    h_prev = jnp.concatenate(
        [jnp.zeros((1, B, H), ff.dtype), h_seq[:-1]], axis=0
    )
    rzr = (h_prev.reshape(T * B, H) @ uzr).reshape(T, B, 2 * H)
    z = jax.nn.sigmoid(ff[..., H : 2 * H] + rzr[..., :H])
    r = jax.nn.sigmoid(ff[..., 2 * H :] + rzr[..., H:])
    rh = r * h_prev
    a = ff[..., :H] + (rh.reshape(T * B, H) @ uh).reshape(T, B, H)
    hc = _act(act_name, a) * mask
    uzr_t, uh_t = uzr.T, uh.T

    def step(dh_next, inputs):
        g_t, hp, z_t, r_t, a_t, hc_t = inputs
        gh = g_t + dh_next
        dz = gh * (hp - hc_t)
        da_z = dz * z_t * (1.0 - z_t)
        dhc = gh * (1.0 - z_t)
        da = dhc * mask * _dact(act_name, a_t)
        drh = da @ uh_t
        dr = drh * hp
        da_r = dr * r_t * (1.0 - r_t)
        dzr = jnp.concatenate([da_z, da_r], axis=1)
        dh_prev = gh * z_t + drh * r_t + dzr @ uzr_t
        return dh_prev, (da, da_z, da_r, dhc)

    _, (da_seq, daz_seq, dar_seq, dhc_seq) = jax.lax.scan(
        step,
        jnp.zeros((B, H), ff.dtype),
        (g, h_prev, z, r, a, hc),
        reverse=True,
    )
    dff = jnp.concatenate([da_seq, daz_seq, dar_seq], axis=-1)
    dzr_seq = jnp.concatenate([daz_seq, dar_seq], axis=-1)
    duzr = h_prev.reshape(T * B, H).T @ dzr_seq.reshape(T * B, 2 * H)
    duh = rh.reshape(T * B, H).T @ da_seq.reshape(T * B, H)
    dmask = jnp.sum(dhc_seq * _act(act_name, a), axis=0)
    return dff, duzr, duh, dmask


gru_recurrence.defvjp(_fwd, _bwd)


def gru_recurrence_scan(ff, uzr, uh, mask, act_name="relu"):
    """Pure lax.scan reference of the same recurrence."""
    H = ff.shape[-1] // 3

    def step(h, ff_t):
        rzr = h @ uzr
        z = jax.nn.sigmoid(ff_t[:, H : 2 * H] + rzr[:, :H])
        r = jax.nn.sigmoid(ff_t[:, 2 * H :] + rzr[:, H:])
        a = ff_t[:, :H] + (r * h) @ uh
        hc = _act(act_name, a) * mask
        h = z * h + (1.0 - z) * hc
        return h, h

    _, h = jax.lax.scan(step, jnp.zeros((ff.shape[1], H), ff.dtype), ff)
    return h
