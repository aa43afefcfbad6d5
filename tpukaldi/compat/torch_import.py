"""Import reference pytorch-kaldi checkpoints (.pkl) into tpukaldi.

The reference saves one torch pickle per architecture per chunk:
`{"model_par": state_dict, "optimizer_par": ...}` (core.py:712-722).  A
user migrating a trained experiment brings those .pkl files; this module
maps their `model_par` tensors onto the corresponding tpukaldi param tree
(and batch-norm running stats), and can write a native .ckpt that
`arch_pretrain_file` accepts.

Weight-layout notes (all verified by the output-parity suite,
tests/test_reference_model_parity.py):
- torch nn.Linear stores (out, in); flax Dense kernels are (in, out) — every
  weight transposes.
- The reference keeps one Linear and one BatchNorm1d PER GATE
  (neural_networks.py:432-450); tpukaldi fuses the feed-forward gate
  projections into one matmul and the per-gate batchnorms into one
  feature-wise batchnorm, so per-gate BN vectors concatenate in the cell's
  FF_GATES order.

Optimizer state IS imported when the pkl carries `optimizer_par` (every
per-chunk reference save does, core.py:719): per-parameter moments
transform exactly like their weights, so rmsprop square_avg / adam
exp_avg(_sq) / sgd momentum buffers are routed through the same layout
mapping and grafted into the matching optax state — a mid-training torch
run resumes here with its optimizer history intact, mirroring the
reference's own pretrain restore (core.py:532).  Unmappable states degrade
to a params-only import with a warning instead of crashing.

CLI:
    python -m tpukaldi.compat.torch_import <ref.pkl> <out.ckpt> <ArchClass>
e.g.
    python -m tpukaldi.compat.torch_import exp/.../train_ep23_ck4_MLP.pkl \
        pretrained_MLP.ckpt MLP
"""

from __future__ import annotations

import sys
from typing import Any, Dict, Optional, Tuple

import numpy as np

# torch attr names per gate, in OUR FF_GATES order (models/recurrent.py)
_GATE_TABLES: Dict[str, Tuple[Tuple[str, str, str], ...]] = {
    # (our gate letter, torch ff attr, torch recurrent attr)
    "liGRU": (("h", "wh", "uh"), ("z", "wz", "uz")),
    "minimalGRU": (("h", "wh", "uh"), ("z", "wz", "uz")),
    "GRU": (("h", "wh", "uh"), ("z", "wz", "uz"), ("r", "wr", "ur")),
    "RNN": (("h", "wh", "uh"),),
    "LSTM": (
        ("f", "wfx", "ufh"),
        ("i", "wix", "uih"),
        ("o", "wox", "uoh"),
        ("c", "wcx", "uch"),
    ),
}


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _n_layers(sd: Dict[str, Any], attr: str) -> int:
    n = 0
    while f"{attr}.{n}.weight" in sd:
        n += 1
    return n


def _bn(sd: Dict[str, Any], key: str) -> Optional[Dict[str, np.ndarray]]:
    if f"{key}.weight" not in sd:
        return None
    return {
        "scale": _np(sd[f"{key}.weight"]),
        "bias": _np(sd[f"{key}.bias"]),
        "mean": _np(sd[f"{key}.running_mean"]),
        "var": _np(sd[f"{key}.running_var"]),
    }


def import_model_par(
    state_dict: Dict[str, Any], class_name: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map a reference `model_par` state_dict to (params, batch_stats)
    trees in tpukaldi naming.  Supports MLP, CNN, SincNet, QLSTM and the recurrent
    zoo (liGRU/GRU/LSTM/minimalGRU/RNN)."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if class_name == "MLP":
        for i in range(_n_layers(sd, "wx")):
            dense = {"kernel": _np(sd[f"wx.{i}.weight"]).T}
            if f"wx.{i}.bias" in sd:
                dense["bias"] = _np(sd[f"wx.{i}.bias"])
            params[f"wx{i}"] = dense
            if f"ln.{i}.gamma" in sd:
                params[f"ln{i}"] = {
                    "gamma": _np(sd[f"ln.{i}.gamma"]),
                    "beta": _np(sd[f"ln.{i}.beta"]),
                }
            bn = _bn(sd, f"bn.{i}")
            if bn:
                params[f"bn{i}"] = {"scale": bn["scale"], "bias": bn["bias"]}
                stats[f"bn{i}"] = {"mean": bn["mean"], "var": bn["var"]}
        if "ln0.gamma" in sd:
            params["ln_inp"] = {
                "gamma": _np(sd["ln0.gamma"]), "beta": _np(sd["ln0.beta"])
            }
        bn = _bn(sd, "bn0")
        if bn:
            params["bn_inp"] = {"scale": bn["scale"], "bias": bn["bias"]}
            stats["bn_inp"] = {"mean": bn["mean"], "var": bn["var"]}
        return params, stats

    if class_name in ("CNN", "SincNet"):
        # conv.{i}: Conv1d (weight layout (out,in,k) identical to ours);
        # SincNet's conv.0 is a SincConv whose learnables are low_hz_/band_hz_
        # (the default sinc_fast=False matches the reference's SincNet,
        # which uses the original SincConv: neural_networks.py:1596-1604)
        # input normalization over the raw window (reference ln0/bn0,
        # neural_networks.py:1491-1497 — the shipped SincNet_raw recipe
        # trains with use_laynorm_inp=True, so dropping these would make
        # every imported forward silently wrong)
        if "ln0.gamma" in sd:
            params["ln_inp"] = {
                "gamma": _np(sd["ln0.gamma"]), "beta": _np(sd["ln0.beta"])
            }
        bn0 = _bn(sd, "bn0")
        if bn0:
            params["bn_inp"] = {"scale": bn0["scale"], "bias": bn0["bias"]}
            stats["bn_inp"] = {"mean": bn0["mean"], "var": bn0["var"]}
        i = 0
        while True:
            if f"conv.{i}.low_hz_" in sd:
                params["low_hz"] = _np(sd[f"conv.{i}.low_hz_"])
                params["band_hz"] = _np(sd[f"conv.{i}.band_hz_"])
            elif f"conv.{i}.weight" in sd:
                params[f"conv{i}"] = _np(sd[f"conv.{i}.weight"])
                if f"conv.{i}.bias" in sd:
                    params[f"conv{i}_b"] = _np(sd[f"conv.{i}.bias"])
            else:
                break
            if f"ln.{i}.gamma" in sd:
                params[f"ln{i}"] = {
                    "gamma": _np(sd[f"ln.{i}.gamma"]),
                    "beta": _np(sd[f"ln.{i}.beta"]),
                }
            bn = _bn(sd, f"bn.{i}")
            if bn:
                params[f"bn{i}"] = {"scale": bn["scale"], "bias": bn["bias"]}
                stats[f"bn{i}"] = {"mean": bn["mean"], "var": bn["var"]}
            i += 1
        return params, stats

    if class_name == "QLSTM":
        # quaternion gates: 4 real weight matrices per QuaternionLinear
        # (quaternion_neural_networks.py:175-223); no transposition — the
        # Hamilton-product layout is shared
        i = 0
        while f"wfx.{i}.r_weight" in sd:
            for g, w_attr, u_attr in (("f", "wfx", "ufh"), ("i", "wix", "uih"),
                                      ("o", "wox", "uoh"), ("c", "wcx", "uch")):
                quad = {c: _np(sd[f"{w_attr}.{i}.{c}_weight"])
                        for c in ("r", "i", "j", "k")}
                if f"{w_attr}.{i}.bias" in sd:
                    quad["bias"] = _np(sd[f"{w_attr}.{i}.bias"])
                params[f"w{g}x{i}"] = quad
                params[f"u{g}h{i}"] = np.stack(
                    [_np(sd[f"{u_attr}.{i}.{c}_weight"])
                     for c in ("r", "i", "j", "k")]
                )
            i += 1
        return params, stats

    if class_name not in _GATE_TABLES:
        raise NotImplementedError(
            f"torch checkpoint import not implemented for {class_name!r} "
            f"(supported: MLP, CNN, SincNet, QLSTM, {', '.join(_GATE_TABLES)})"
        )

    gates = _GATE_TABLES[class_name]
    n_lay = _n_layers(sd, gates[0][1])
    for i in range(n_lay):
        bn_parts = []
        for g, w_attr, u_attr in gates:
            params[f"w{g}{i}"] = _np(sd[f"{w_attr}.{i}.weight"]).T
            if f"{w_attr}.{i}.bias" in sd:
                params[f"b{g}{i}"] = _np(sd[f"{w_attr}.{i}.bias"])
            params[f"u{g}{i}"] = _np(sd[f"{u_attr}.{i}.weight"]).T
            bn = _bn(sd, f"bn_{w_attr}.{i}")
            if bn:
                bn_parts.append(bn)
        if bn_parts:
            # per-gate BatchNorm1d -> one fused feature BN, FF_GATES order
            params[f"bn_ff{i}"] = {
                "scale": np.concatenate([b["scale"] for b in bn_parts]),
                "bias": np.concatenate([b["bias"] for b in bn_parts]),
            }
            stats[f"bn_ff{i}"] = {
                "mean": np.concatenate([b["mean"] for b in bn_parts]),
                "var": np.concatenate([b["var"] for b in bn_parts]),
            }
        if f"ln.{i}.gamma" in sd:
            params[f"ln{i}_gamma"] = _np(sd[f"ln.{i}.gamma"])
            params[f"ln{i}_beta"] = _np(sd[f"ln.{i}.beta"])
    if "ln0.gamma" in sd:
        params["ln_inp_gamma"] = _np(sd["ln0.gamma"])
        params["ln_inp_beta"] = _np(sd["ln0.beta"])
    bn = _bn(sd, "bn0")
    if bn:
        params["bn_inp"] = {"scale": bn["scale"], "bias": bn["bias"]}
        stats["bn_inp"] = {"mean": bn["mean"], "var": bn["var"]}
    return params, stats


def convert_pase_checkpoint(
    state_dict: Dict[str, Any], options: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map a pase-package frontend state dict onto the native PASE encoder
    (models/pase.py) by ORDER of appearance with shape validation.

    The pase checkpoint is a flat torch state dict whose module prefixes
    vary across pase versions, so modules are classified structurally:
    a prefix owning running_mean/running_var is a BatchNorm, a 3-D weight
    is a Conv1d ((out, in, k) -> our NWC (k, in, out)), low_hz_/band_hz_
    are the sinc front-end, and a lone 1-D weight following a conv/bn is
    a PReLU slope.  Raises with the offending prefix on any shape that
    does not fit the pase_cfg-derived architecture.
    """
    from ..models.pase import read_pase_cfg

    cfg = read_pase_cfg(options)
    groups: Dict[str, Dict[str, Any]] = {}
    order = []
    for key, val in state_dict.items():
        prefix, _, leaf = key.rpartition(".")
        if "num_batches_tracked" in leaf:
            continue
        if prefix not in groups:
            groups[prefix] = {}
            order.append(prefix)
        groups[prefix][leaf] = _np(val)

    seq = []  # (kind, payload) in appearance order
    for prefix in order:
        g = groups[prefix]
        if "low_hz_" in g or "band_hz_" in g:
            seq.append(("sinc", g))
        elif "running_mean" in g:
            seq.append(("bn", g))
        elif "weight" in g and g["weight"].ndim == 3:
            seq.append(("conv", g))
        elif "weight" in g and g["weight"].ndim <= 1 and len(g) == 1:
            seq.append(("prelu", g))
        # anything else (qrnn workers, decoders) is ignored: only the
        # frontend encoder maps onto this module

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def take(kind, where):
        while seq:
            k, g = seq.pop(0)
            if k == kind:
                return g
        raise ValueError(
            f"pase checkpoint exhausted looking for a {kind!r} for {where!r}"
        )

    sinc = take("sinc", "sinc front-end")
    params["low_hz"] = sinc["low_hz_"].reshape(-1, 1)
    params["band_hz"] = sinc["band_hz_"].reshape(-1, 1)

    def put_bn(name, where):
        g = take("bn", where)
        params[name] = {"scale": g["weight"], "bias": g["bias"]}
        stats[name] = {"mean": g["running_mean"], "var": g["running_var"]}

    def put_prelu(name, where, n_chan):
        g = take("prelu", where)
        w = g["weight"].reshape(-1)
        if w.size == 1:  # torch scalar PReLU broadcasts per channel
            w = np.broadcast_to(w, (n_chan,)).copy()
        params[name] = w

    put_bn("sinc_bn", "sinc_bn")
    put_prelu("sinc_act", "sinc_act", cfg["sinc_out"])
    for i, (f, k, s) in enumerate(
        zip(cfg["fmaps"], cfg["kwidths"], cfg["strides"])
    ):
        g = take("conv", f"conv{i}")
        w = g["weight"]
        if w.shape[0] != f or w.shape[2] != k:
            raise ValueError(
                f"conv{i}: checkpoint shape {w.shape} does not match "
                f"pase_cfg (fmaps={f}, kwidth={k})"
            )
        conv = {"kernel": w.transpose(2, 1, 0)}
        if "bias" in g:
            conv["bias"] = g["bias"]
        params[f"conv{i}"] = conv
        put_bn(f"bn{i}", f"bn{i}")
        put_prelu(f"act{i}", f"act{i}", f)
    g = take("conv", "emb")
    emb = {"kernel": g["weight"].transpose(2, 1, 0)}
    if "bias" in g:
        emb["bias"] = g["bias"]
    params["emb"] = emb
    put_bn("emb_bn", "emb_bn")
    return params, stats


def convert_pase_checkpoint_file(
    ckpt_path: str, cfg_path: str, out_ckpt: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch-load a pase checkpoint and write a native .ckpt usable as
    `arch_pretrain_file` (torch needed only at conversion time)."""
    import torch

    from ..train.checkpoint import save_checkpoint

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, stats = convert_pase_checkpoint(sd, {"pase_cfg": cfg_path})
    save_checkpoint(out_ckpt, params, opt_state=None, batch_stats=stats)
    return params, stats


# state_dict entries that are torch buffers, not parameters: filtering them
# out of a model_par recovers the named_parameters() order, which is the
# order torch optimizers key their per-parameter state by (param_groups[0]
# ["params"] is list(range(n_params)) in state_dict form)
_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def _param_name_order(model_par: Dict[str, Any]) -> list:
    return [
        k for k in model_par
        if not any(k.endswith(s) for s in _BUFFER_SUFFIXES)
    ]


def _torch_group_kind(group: Dict[str, Any]) -> Optional[str]:
    if "alpha" in group:
        return "rmsprop"
    if "betas" in group or "amsgrad" in group:
        return "adam"
    if "nesterov" in group or "dampening" in group:
        return "sgd"
    return None


def _graft_moments(state, replaces: Dict[str, Any], count=None):
    """Functionally replace moment fields (by namedtuple field name) inside
    an optax state tree: 'nu'/'mu' (rms/adam/stddev), 'trace' (momentum).
    `count` overwrites every integer step counter (adam bias correction)."""
    import jax.numpy as jnp

    def rec(s):
        if hasattr(s, "_fields"):  # optax states are namedtuples
            vals = []
            for f in s._fields:
                v = getattr(s, f)
                if f in replaces and replaces[f] is not None:
                    vals.append(replaces[f])
                elif f == "count" and count is not None:
                    vals.append(jnp.asarray(count, dtype=jnp.int32))
                else:
                    vals.append(rec(v))
            return type(s)(*vals)
        if isinstance(s, tuple):
            return tuple(rec(x) for x in s)
        if isinstance(s, list):
            return [rec(x) for x in s]
        return s

    return rec(state)


def import_optimizer_par(
    model_par: Dict[str, Any],
    optimizer_par: Dict[str, Any],
    class_name: str,
    params: Dict[str, Any],
) -> Optional[Any]:
    """Map a reference optimizer state_dict (`optimizer_par`, saved per
    chunk at core.py:719) onto the matching optax state, so a mid-training
    torch run resumes in tpukaldi with its momentum/second-moment history
    intact — the reference itself restores this state on every pretrain
    load (core.py:532).

    The per-parameter moment tensors transform exactly like their weights
    (transpose, per-gate fusion), so each moment state_dict is routed
    through `import_model_par` and grafted into a freshly initialized
    optax state built from the pkl's own param_groups hyperparameters.
    Returns None when there is nothing to import (e.g. momentum-0 sgd,
    whose torch state is empty)."""
    state = optimizer_par.get("state") or {}
    groups = optimizer_par.get("param_groups") or []
    if not groups:
        return None
    g = groups[0]
    kind = _torch_group_kind(g)
    if kind is None:
        return None
    names = _param_name_order(model_par)
    idxs = list(g.get("params", []))
    if len(idxs) != len(names):
        raise ValueError(
            f"optimizer group tracks {len(idxs)} params but model_par has "
            f"{len(names)} parameter tensors"
        )

    def moment_tree(key) -> Optional[Dict[str, Any]]:
        """One moment (e.g. square_avg) arranged as a params-shaped tree."""
        seen = False
        msd: Dict[str, Any] = {
            k: v for k, v in model_par.items()
            if any(k.endswith(s) for s in _BUFFER_SUFFIXES)
        }
        for pos, idx in enumerate(idxs):
            st = state.get(idx, state.get(str(idx), {}))
            if key in st:
                msd[names[pos]] = st[key]
                seen = True
            else:
                msd[names[pos]] = np.zeros_like(_np(model_par[names[pos]]))
        if not seen:
            return None
        tree, _ = import_model_par(msd, class_name)
        return tree

    # build the same optax chain train/optimizers.py would for this
    # optimizer config, then graft the torch moments into its state
    from types import SimpleNamespace

    from ..train.optimizers import make_optimizer

    optd: Dict[str, Any] = {"opt_weight_decay": g.get("weight_decay", 0.0)}
    if kind == "rmsprop":
        optd.update(
            opt_alpha=g.get("alpha", 0.99), opt_eps=g.get("eps", 1e-8),
            opt_centered=g.get("centered", False),
            opt_momentum=g.get("momentum", 0.0),
        )
        replaces = {
            "nu": moment_tree("square_avg"),
            "mu": moment_tree("grad_avg"),       # centered variant
            "trace": moment_tree("momentum_buffer"),
        }
    elif kind == "adam":
        optd.update(
            opt_betas=list(g.get("betas", (0.9, 0.999))),
            opt_eps=g.get("eps", 1e-8), opt_amsgrad=g.get("amsgrad", False),
        )
        replaces = {
            "mu": moment_tree("exp_avg"),
            "nu": moment_tree("exp_avg_sq"),
            "nu_max": moment_tree("max_exp_avg_sq"),  # amsgrad
        }
    else:  # sgd
        optd.update(
            opt_momentum=g.get("momentum", 0.0),
            opt_nesterov=g.get("nesterov", False),
            opt_dampening=g.get("dampening", 0.0),
        )
        replaces = {"trace": moment_tree("momentum_buffer")}
    if not any(v is not None for v in replaces.values()):
        return None  # stateless (e.g. plain sgd): nothing to carry over

    count = None
    for st in state.values():
        if "step" in st:
            count = int(_np(st["step"]).reshape(-1)[0])
            break

    arch = SimpleNamespace(
        name=f"torch-import-{kind}", lr=[float(g.get("lr", 1e-3))],
        options={}, optimizer=SimpleNamespace(kind=kind, options=optd),
    )
    state0 = make_optimizer(arch).init(params)
    return _graft_moments(state0, replaces, count=count)


def convert_checkpoint_file(
    pkl_path: str, out_ckpt: str, class_name: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read a reference .pkl and write a tpukaldi .ckpt usable as
    `arch_pretrain_file`.  Returns the (params, batch_stats) trees.

    When the pkl carries `optimizer_par` (every per-chunk reference save
    does), the optimizer moments are converted too, so resuming a
    mid-training reference run keeps its rmsprop/adam/momentum history —
    the same semantics the reference applies to its own pretrain files
    (core.py:523-535).  If the moments cannot be mapped (exotic optimizer,
    layout mismatch) the checkpoint is written params-only with a warning;
    loading against a different cfg optimizer likewise degrades to a fresh
    optimizer instead of crashing (train/checkpoint.py restore_opt)."""
    import torch

    from ..train.checkpoint import save_checkpoint

    blob = torch.load(pkl_path, map_location="cpu", weights_only=True)
    sd = blob["model_par"] if "model_par" in blob else blob
    params, stats = import_model_par(sd, class_name)
    opt_state = None
    if isinstance(blob, dict) and blob.get("optimizer_par"):
        try:
            opt_state = import_optimizer_par(
                sd, blob["optimizer_par"], class_name, params)
        except Exception as e:  # noqa: BLE001 — params still convert
            print(
                f"[torch_import] optimizer state not imported ({e}); "
                "fine-tuning restarts the optimizer",
                file=sys.stderr,
            )
    save_checkpoint(out_ckpt, params, opt_state=opt_state, batch_stats=stats)
    return params, stats


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 3:
        print(
            "usage: python -m tpukaldi.compat.torch_import "
            "<reference.pkl> <out.ckpt> <ArchClass>",
            file=sys.stderr,
        )
        return 2
    convert_checkpoint_file(argv[0], argv[1], argv[2])
    print(f"wrote {argv[1]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
