"""Serving export: serialize a trained experiment's acoustic model to a
portable StableHLO artifact.

The reference has no deployment story beyond re-running `run_exp.py` in
production mode (run_exp.py:168-174) — the trained model only exists as
torch pickles bound to the Python class code.  tpukaldi goes further:
`python -m tpukaldi.tools.export_model <cfg> --out <dir>` freezes the
compiled forward function (graph DSL -> modules -> log-softmax posteriors,
optionally prior-normalized) into a `jax.export` StableHLO artifact with a
SYMBOLIC time axis, plus a tiny JSON sidecar.  The artifact is
self-contained — params are baked in as constants — and can be reloaded
and served without the model zoo, the config system, or this package's
Python code (only `jax.export.deserialize`), on any platform it was
lowered for.

Design notes:
- the recurrent `*_impl` options are forced to `scan` for the export so the
  artifact contains no TPU-specific pallas custom calls (portable across
  the platforms requested with --platforms);
- input contract matches the driver's forward mode (core.py:483-484
  semantics): `(T, B, D)` time-major features, `lengths (B,)` valid frame
  counts (drives the exact lengths-aware bidirectional reversal).  By
  default BOTH T and B are symbolic — one artifact serves any utterance
  length at any batch size (bucketed batched serving included); pass
  `--batch N` to pin the batch when a graph resists batch polymorphism
  (the export falls back to batch=1 automatically in that case);
- `--normalize` bakes the count-file log-priors into the function so the
  output is directly the decoder input (core.py:665-668 semantics).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
from typing import Dict, Optional

import numpy as np


def _sample_chunk(exp, n_utts: int = 1):
    """Load a tiny fea-only chunk of the forward dataset to discover the
    feature layout (splice/cw dims) exactly as the runtime would."""
    import shutil

    from ..config.model_dsl import used_names
    from ..data.chunk_loader import load_chunk

    ds = exp.datasets[exp.forward_with[0]]
    fea_names = used_names(exp.model, list(ds.features), "input") or list(
        ds.features
    )
    tmp = tempfile.mkdtemp(prefix="tpukaldi_export_")
    try:
        overrides = {}
        for name in fea_names:
            f = ds.features[name]
            with open(f.lst) as fh:
                lines = [l for l in fh.read().splitlines()
                         if l.strip()][:n_utts]
            p = os.path.join(tmp, f"{name}.lst")
            with open(p, "w") as fh:
                fh.write("\n".join(lines) + "\n")
            overrides[name] = p
        msl = exp.batches.msl_for_phase("forward", 0)
        return load_chunk(ds, fea_names, [], msl, fea_only=True,
                          fea_lst_override=overrides)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def export_forward(
    cfg_path: str,
    out_dir: str,
    batch: int = 0,
    platforms: Optional[list] = None,
    normalize: bool = False,
) -> str:
    """Export the trained forward function; returns the artifact dir."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from ..config import load_config
    from ..graph.compiler import build_graph, init_graph
    from ..train import checkpoint as ckpt
    from ..train.step import make_forward_step

    exp = load_config(cfg_path)

    # portable artifact: no pallas custom calls in the export
    for arch in exp.archs.values():
        for prefix in ("ligru", "lstm", "gru"):
            key = f"{prefix}_impl"
            if key in arch.options or arch.options.get(f"{prefix}_lay"):
                arch.options[key] = "scan"

    chunk = _sample_chunk(exp)
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    D = chunk.feats.shape[-1]
    sample = jnp.asarray(
        chunk.feats[: min(8, chunk.feats.shape[0])][:, None, :]
    )
    params, stats = init_graph(graph, jax.random.key(exp.seed), sample)

    # trained state: the promoted final checkpoints
    exp_files = os.path.join(exp.out_folder, "exp_files")
    finals = {
        a: os.path.join(exp_files, f"final_{a}.ckpt") for a in graph.arch_names
    }
    missing = [p for p in finals.values() if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"final checkpoints not found (train first): {missing}"
        )
    params, _, stats = ckpt.load_all(finals, params, None, stats)

    log_priors: Dict[str, np.ndarray] = {}
    if normalize:
        from ..forward.counts import resolve_count_files
        from ..io.feats import load_counts

        resolve_count_files(exp, exp_files)
        for i, out in enumerate(exp.forward.outs):
            if exp.forward.normalize_posteriors[i]:
                counts = load_counts(exp.forward.counts_from[i])
                counts = np.maximum(counts, 1.0)
                log_priors[out] = np.log(counts / counts.sum())

    # match the experiment's forward compute dtype (bf16 cfgs must export
    # the same numerics their ledger/decode posteriors used)
    from ..train.chunk_runtime import ChunkRuntime

    compute_dtype = ChunkRuntime(exp)._compute_dtype()
    # priors baked into the exported graph (train/step.py fuses the
    # subtraction as an XLA constant)
    fwd = make_forward_step(
        graph, compute_dtype=compute_dtype, log_priors=log_priors or None
    )

    def serve(feats, lengths):
        return fwd(params, stats, feats, lengths)

    kwargs = {}
    if platforms:
        kwargs["platforms"] = platforms

    def _export(b):
        if b == 0:
            T, B = jax_export.symbolic_shape("t, b")
        else:
            T = jax_export.symbolic_shape("t")[0]
            B = b
        args = (
            jax.ShapeDtypeStruct((T, B, D), jnp.float32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        )
        return jax_export.export(jax.jit(serve), **kwargs)(*args)

    try:
        exported = _export(batch)
        exported_batch = batch
    except Exception as e:
        if batch != 0:
            raise
        # some graphs resist batch polymorphism (e.g. shape products the
        # solver cannot relate); a fixed reference-forward batch of 1 is
        # always exportable — but say so, the downgrade changes the
        # artifact's serving contract (meta.json batch=1)
        import logging

        logging.warning(
            "symbolic-batch export failed (%s: %s); falling back to a "
            "fixed batch=1 artifact", type(e).__name__, e,
        )
        exported = _export(1)
        exported_batch = 1

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "forward.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    ds = exp.datasets[exp.forward_with[0]]
    meta = {
        "format": "tpukaldi-serving-v1",
        "inp_dim": int(D),
        "batch": int(exported_batch),  # 0 = symbolic (any batch size)
        "seq_model": bool(graph.seq_model),
        "outs": list(exp.forward.outs),
        "normalized": sorted(log_priors),
        "platforms": list(exported.platforms),
        "compute_dtype": "bfloat16" if compute_dtype is not None else
        "float32",
        # the INPUT CONTRACT: the artifact consumes LOADER-PROCESSED
        # features — the same (T, B, D) tensors the runtime feeds the
        # network, i.e. after the per-stream fea_opts pipeline, context-
        # window splice, and the reference's per-chunk CMVN
        # (data/chunk_loader.py).  Raw un-normalized features of the right
        # width would yield silently degraded posteriors.
        "input_contract": {
            "preprocessing": "fea_opts + splice + per-chunk CMVN "
            "(tpukaldi.data.chunk_loader semantics)",
            "streams": {
                name: {"cw_left": f.cw_left, "cw_right": f.cw_right,
                       "fea_opts": f.opts}
                for name, f in ds.features.items()
            },
        },
        "source_cfg": os.path.abspath(cfg_path),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class ExportedModel:
    """Reloaded serving artifact: `call(feats (T,B,D) f32, lengths (B,)
    i32) -> {out_name: (T*B, C) log-posteriors}`.  Needs only jax —
    no tpukaldi model code."""

    def __init__(self, art_dir: str):
        from jax import export as jax_export

        with open(os.path.join(art_dir, "forward.stablehlo"), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        with open(os.path.join(art_dir, "meta.json")) as f:
            self.meta = json.load(f)

    def call(self, feats, lengths=None):
        import jax.numpy as jnp

        feats = jnp.asarray(feats, jnp.float32)
        if feats.ndim == 2:
            feats = feats[:, None, :]
        if lengths is None:
            lengths = [feats.shape[0]] * feats.shape[1]
        return self._exported.call(
            feats, jnp.asarray(lengths, jnp.int32)
        )


def load_exported(art_dir: str) -> ExportedModel:
    return ExportedModel(art_dir)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Export a trained tpukaldi model to a portable "
        "StableHLO serving artifact."
    )
    ap.add_argument("cfg", help="experiment cfg (training must be complete)")
    ap.add_argument("--out", required=True, help="artifact output directory")
    ap.add_argument("--batch", type=int, default=0,
                    help="batch size of the artifact; 0 (default) = "
                    "symbolic, serves any batch size")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. tpu,cpu (default: current)")
    ap.add_argument("--normalize", action="store_true",
                    help="bake count-file log-priors into the output "
                    "(emit decoder-ready normalized posteriors)")
    args = ap.parse_args(argv)
    # exporting is an abstract trace — it needs no device, and must not
    # hang when the local accelerator is unreachable
    from ._platform import honor_jax_platforms

    honor_jax_platforms()
    platforms = args.platforms.split(",") if args.platforms else None
    out = export_forward(args.cfg, args.out, batch=args.batch,
                         platforms=platforms, normalize=args.normalize)
    print(f"exported -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
