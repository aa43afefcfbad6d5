"""Benchmark: training frames/sec/chip on the flagship TIMIT Li-GRU fMLLR
workload (reference cfg/TIMIT_baselines/TIMIT_liGRU_fmllr.cfg: 5-layer
bidirectional Li-GRU 550, batchnorm-in-recurrence, fMLLR 40-dim input,
cd(1944) + mono(48) MLP heads, joint loss, batch_size 8).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (documented estimate — the CUDA baseline cannot be run
here): the reference README's res.res trace gives ~87 s/epoch for the TIMIT
*MLP* on an unspecified 2018 GPU (README.md:208-218).  TIMIT train is
~3.1 h of speech = ~1.12M frames, i.e. ~12.9k frames/s for the MLP.  The
Li-GRU is strictly slower per frame than the MLP on the same hardware
(sequential recurrence), so using BASELINE_FPS = 12900 *understates* our
speedup vs the true Li-GRU CUDA baseline.

End-to-end context (see PARITY.md "Measured at full scale"): the complete
driver — host pipeline, ledger, validation included — trains a TIMIT-scale
epoch of this exact recipe in ~34 s on one tunneled v5e chip (2.6x the
reference MLP epoch trace).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

BASELINE_FPS = 12900.0  # frames/sec, reference-GPU estimate (see docstring)

T, B, D = 500, 8, 40  # max_seq_length-scale batch at the reference batch size
N_CD, N_MONO = 1944, 48
WARMUP, ITERS, WINDOWS = 3, 20, 3


def build():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import FLAGSHIP_LIGRU_OPTS
    from tpukaldi.models import MLP, liGRU

    body = liGRU(options=FLAGSHIP_LIGRU_OPTS, inp_dim=D)
    head_cd = MLP(
        options={
            "dnn_lay": str(N_CD), "dnn_drop": "0.0",
            "dnn_use_laynorm_inp": "False", "dnn_use_batchnorm_inp": "False",
            "dnn_use_batchnorm": "False", "dnn_use_laynorm": "False",
            "dnn_act": "softmax",
        },
        inp_dim=body.out_dim,
    )
    head_mono = MLP(
        options={
            "dnn_lay": str(N_MONO), "dnn_drop": "0.0",
            "dnn_use_laynorm_inp": "False", "dnn_use_batchnorm_inp": "False",
            "dnn_use_batchnorm": "False", "dnn_use_laynorm": "False",
            "dnn_act": "softmax",
        },
        inp_dim=body.out_dim,
    )
    return body, head_cd, head_mono


def main():
    body, head_cd, head_mono = build()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, B, D)), jnp.float32)
    y_cd = jnp.asarray(rng.integers(0, N_CD, (T * B,)))
    y_mono = jnp.asarray(rng.integers(0, N_MONO, (T * B,)))

    vb = body.init({"params": jax.random.key(0), "dropout": jax.random.key(9)},
                   x, train=True)
    h = body.apply(vb, x, train=False)
    hf = h.reshape(T * B, -1)
    vcd = head_cd.init({"params": jax.random.key(1)}, hf)
    vmono = head_mono.init({"params": jax.random.key(2)}, hf)
    params = {"body": vb["params"], "cd": vcd["params"], "mono": vmono["params"]}
    stats = vb.get("batch_stats", {})
    tx = optax.sgd(0.0004)
    opt = tx.init(params)

    def loss_fn(params, stats, x, y_cd, y_mono, key):
        h, upd = body.apply(
            {"params": params["body"], "batch_stats": stats},
            x, train=True, rngs={"dropout": key}, mutable=["batch_stats"],
        )
        hf = h.reshape(T * B, -1)
        logp_cd = head_cd.apply({"params": params["cd"]}, hf, train=True)
        logp_mono = head_mono.apply({"params": params["mono"]}, hf, train=True)
        nll_cd = -jnp.take_along_axis(logp_cd, y_cd[:, None], axis=1).mean()
        nll_mono = -jnp.take_along_axis(logp_mono, y_mono[:, None], axis=1).mean()
        return nll_cd + 1.0 * nll_mono, upd["batch_stats"]

    # donate state buffers like the production train step (train/step.py):
    # in-place param/opt updates avoid a full extra copy of the state in HBM
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, stats, opt, x, y_cd, y_mono, key):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, x, y_cd, y_mono, key
        )
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_stats, opt, loss

    key = jax.random.key(0)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        params, stats, opt, loss = step(params, stats, opt, x, y_cd, y_mono, sub)
    # device_get forces a real host sync (block_until_ready alone was
    # observed not to drain the async dispatch queue on the axon platform)
    float(jax.device_get(loss))

    # best of WINDOWS timed windows: the tunneled dev chip is a shared
    # resource and a single window can catch interference troughs; the max
    # is the honest steady-state device throughput
    best_dt = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            key, sub = jax.random.split(key)
            params, stats, opt, loss = step(
                params, stats, opt, x, y_cd, y_mono, sub
            )
        float(jax.device_get(loss))
        best_dt = min(best_dt, time.perf_counter() - t0)

    fps = T * B * ITERS / best_dt
    print(
        json.dumps(
            {
                "metric": "train_frames_per_sec_per_chip_liGRU_fmllr",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
