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

Backward (custom VJP): gates rematerialized with two hoisted big matmuls
(h_prev @ Uzr and (r*h_prev) @ Uh); the reverse scan carries dh with two
small matmuls per step; dUzr/dUh/dmask are post-scan contractions.
(A fused pallas backward like kernels/ligru.py's is VMEM-borderline here
— 6H^2 resident floats for Uzr/Uh + their grads — so the hoisted scan
stays; the flagship liGRU path is where the fused kernel pays.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _bwd(act_name, interpret, res, g):
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
