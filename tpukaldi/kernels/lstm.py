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

Backward (custom VJP): gates rematerialized from the saved h sequence with
one hoisted (T*B, H) x (H, 4H) matmul; the reverse scan carries only
(dh, dc); dU/dmask are single post-scan contractions.

A liGRU-style fused pallas backward (kernels/ligru.py::_ligru_bwd_kernel)
is deliberately NOT used here: with 4 gates the resident U + dU blocks
alone cost 8H^2 floats (~9.7 MB at H=550) and the streamed ff/dff blocks
push past the ~16 MB VMEM budget; the hoisted scan keeps every matmul
MXU-shaped without that ceiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _bwd(interpret, res, g):
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
